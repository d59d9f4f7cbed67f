"""Pallas kernel bodies vs the int oracle (interpret mode on CPU).

The kernel bodies are the shared `limbmath` algorithms; this checks the
pallas_call plumbing (consts-as-input binding, block gridding, padding)
— the TPU execution path minus Mosaic. Edge cases: 0, mod-1, identity
points, P+P (doubling), P+(-P) (infinity)."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zprize_tpu.fields import pkern
from zprize_tpu.fields.mont import FR, FQ
from zprize_tpu.ref.curve import G1_GEN, g1_mul, g1_add
from zprize_tpu.curve import g1 as jg1


@pytest.mark.parametrize("C", [FR, FQ], ids=["fr", "fq"])
def test_field_kernels(C):
    random.seed(1)
    M = C.mod
    xs = [random.randrange(M) for _ in range(61)] + [0, M - 1, 1]
    ys = [random.randrange(M) for _ in range(61)] + [M - 1, M - 1, 0]
    a = jnp.asarray(C.to_mont_host(xs))
    b = jnp.asarray(C.to_mont_host(ys))
    out = pkern.mul(C.K, a, b, interpret=True)
    assert C.from_mont_host(np.asarray(out)) == \
        [x * y % M for x, y in zip(xs, ys)]
    out = pkern.add(C.K, a, b, interpret=True)
    assert C.from_mont_host(np.asarray(out)) == \
        [(x + y) % M for x, y in zip(xs, ys)]
    out = pkern.sub(C.K, a, b, interpret=True)
    assert C.from_mont_host(np.asarray(out)) == \
        [(x - y) % M for x, y in zip(xs, ys)]
    out = pkern.neg(C.K, a, interpret=True)
    assert C.from_mont_host(np.asarray(out)) == [(-x) % M for x in xs]
    p, m = pkern.mul_add_sub(C.K, a, b, b, interpret=True)
    assert C.from_mont_host(np.asarray(p)) == \
        [(x + y * y) % M for x, y in zip(xs, ys)]
    assert C.from_mont_host(np.asarray(m)) == \
        [(x - y * y) % M for x, y in zip(xs, ys)]


def test_xyzz_add_affine2_kernel():
    random.seed(2)
    M = FQ.mod
    pts = [g1_mul(G1_GEN, random.randrange(1, 1000)) for _ in range(5)]
    qts = [g1_mul(G1_GEN, random.randrange(1, 1000)) for _ in range(5)]
    pts += [None, pts[0], pts[1]]
    qts += [qts[0], pts[0], (pts[1][0], (M - pts[1][1]) % M)]
    px, py, _ = jg1.affine_points_to_device(pts)
    qx, qy, _ = jg1.affine_points_to_device(qts)
    r = pkern.xyzz_add_affine2(FQ.K, px, py, qx, qy, interpret=True)
    rd = {k: r[i * FQ.L:(i + 1) * FQ.L]
          for i, k in enumerate(("X", "Y", "ZZ", "ZZZ"))}
    aff = jg1.xyzz_to_affine_host(rd)
    for i, (p, q) in enumerate(zip(pts, qts)):
        assert aff[i] == g1_add(p, q), i
