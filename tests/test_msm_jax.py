"""Device Pippenger MSM vs the Python oracle (small windows for CPU speed)."""

import random

import pytest

from zprize_tpu.ops import msm as jmsm
from zprize_tpu.ref.curve import G1_GEN, g1_mul, g1_msm
from zprize_tpu.params import R_MOD


@pytest.mark.slow
def test_msm_matches_oracle():
    rng = random.Random(5)
    n = 64
    pts = [g1_mul(G1_GEN, rng.randrange(1, 1000)) for _ in range(n)]
    pts[7] = None
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    scalars[3] = 0
    scalars[5] = 1
    assert jmsm.msm(pts, scalars, window_bits=4) == g1_msm(pts, scalars)


@pytest.mark.slow
def test_msm_zero_and_tiny():
    pts = [G1_GEN, g1_mul(G1_GEN, 2)]
    assert jmsm.msm(pts, [0, 0], window_bits=4) is None
    assert jmsm.msm(pts, [1, 0], window_bits=4) == G1_GEN


@pytest.mark.slow
def test_grouped_window_grid_matches_oracle():
    """msm_window_grid_batch (grouped windows + batched-affine bucket
    tree) against the Python oracle, including identity points, repeated
    points (doubling inside buckets) and zero scalars."""
    import numpy as np
    import jax.numpy as jnp
    from zprize_tpu.curve import g1
    from zprize_tpu.fields.limb import ints_to_limbs
    from zprize_tpu.ref.curve import g1_msm

    rng = random.Random(11)
    n = 64
    pts = [g1_mul(G1_GEN, rng.randrange(1, 1000)) for _ in range(n)]
    pts[3] = None
    pts[10] = pts[11]                    # equal points in one bucket
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    scalars[5] = 0
    dev = g1.affine_points_to_device(pts)
    digits = jnp.asarray(ints_to_limbs(
        [s % (1 << 256) for s in scalars], 16).T.copy())
    wb = 4
    dig = jmsm.limbs16_to_digits(digits, wb)          # (64, n)
    cap = jmsm.bucket_capacity(n, wb)
    w, over = jmsm.msm_window_grid_batch(
        dev[0], dev[1], jnp.asarray(dig), wb, cap)
    assert int(np.asarray(over).sum()) == 0
    wins = g1.xyzz_to_affine_host(w)
    from zprize_tpu.ref.curve import g1_add, g1_double
    acc = None
    for wp in reversed(wins):
        for _ in range(wb):
            acc = g1_double(acc)
        acc = g1_add(acc, wp)
    assert acc == g1_msm(pts, scalars)


@pytest.mark.slow
def test_msm_overflow_multipass():
    """Adversarially repeated scalars (every bucket's occupancy far beyond
    the Poisson capacity) must be drained by extra same-shape passes —
    msm_window_xyzz point results must still match the oracle, with NO
    recompile at a bigger capacity (capacity is pinned here)."""
    import numpy as np
    import jax.numpy as jnp
    from zprize_tpu.curve import g1
    from zprize_tpu.fields.limb import ints_to_limbs

    rng = random.Random(7)
    n = 64
    pts = [g1_mul(G1_GEN, rng.randrange(1, 1000)) for _ in range(n)]
    # one repeated scalar value for 3/4 of the points: its digit lands in
    # the same bucket of every window, occupancy 48 >> cap
    s_rep = rng.randrange(R_MOD)
    scalars = [s_rep] * 48 + [rng.randrange(R_MOD) for _ in range(n - 48)]
    dev = g1.affine_points_to_device(pts)
    digits = jnp.asarray(ints_to_limbs(
        [s % (1 << 256) for s in scalars], 16).T.copy())
    cap = 8                                  # force ~6 passes
    ptsT, wb = jmsm.msm_window_xyzz(dev, digits, window_bits=4,
                                    capacity=cap)
    wins = g1.xyzz_to_affine_host(ptsT)
    from zprize_tpu.ref.curve import g1_add, g1_double
    acc = None
    for wp in reversed(wins):
        for _ in range(wb):
            acc = g1_double(acc)
        acc = g1_add(acc, wp)
    assert acc == g1_msm(pts, scalars)


@pytest.mark.slow
def test_affine_add_batched_cases():
    """affine_add_batched special cases: identity both sides, doubling,
    cancellation, and generic adds — vs the Python oracle."""
    import numpy as np
    import jax.numpy as jnp
    from zprize_tpu.curve import g1
    from zprize_tpu.ref.curve import g1_add, g1_neg

    P = g1_mul(G1_GEN, 5)
    Q = g1_mul(G1_GEN, 9)
    negP = g1_neg(P)
    pairs = [(P, Q), (P, P), (P, negP), (None, Q), (P, None), (None, None)]
    ax, ay = g1.affine_points_to_device([a for a, _ in pairs])[:2]
    bx, by = g1.affine_points_to_device([b for _, b in pairs])[:2]
    rx, ry = g1.affine_add_batched(ax, ay, bx, by)
    got = []
    from zprize_tpu.fields.mont import FQ
    X = FQ.from_mont_host(np.asarray(rx))
    Y = FQ.from_mont_host(np.asarray(ry))
    for x, y in zip(X, Y):
        got.append(None if (x == 0 and y == 0) else (x, y))
    want = [g1_add(a, b) for a, b in pairs]
    assert got == want
