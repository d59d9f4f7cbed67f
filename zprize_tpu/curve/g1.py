"""BLS12-381 G1 arithmetic in xyzz (extended Jacobian) coordinates over
limbed Fq tensors — TPU-native counterpart of the reference's
`lib/PLONK/utils/zkp/cuda/ec/xyzz_t.hpp`.

A point batch is a dict of (..., L) Montgomery-form uint32 arrays:
  {"X", "Y", "ZZ", "ZZZ"}     with x = X/ZZ, y = Y/ZZZ, ZZ^3 = ZZZ^2.
Identity is encoded as ZZ == 0 (as in xyzz_t).

All branches (identity, doubling, inverse points) are resolved with
element-wise selects so the ops compose into scans/reductions under XLA.
"""

import numpy as np
import jax.numpy as jnp

from ..fields import mont
from ..fields.mont import FQ, U32


def xyzz_zero(shape=()):
    L = FQ.L
    z = jnp.zeros(shape + (L,), dtype=U32)
    return {"X": z, "Y": z, "ZZ": z, "ZZZ": z}


def xyzz_from_affine(x, y, inf_mask=None):
    """x, y: (..., L) Montgomery-form; inf_mask: (...,) bool."""
    one = jnp.broadcast_to(jnp.asarray(FQ.one_mont, dtype=U32), x.shape)
    zz = one
    zzz = one
    if inf_mask is not None:
        zero = jnp.zeros_like(x)
        zz = mont.select(~inf_mask, zz, zero)
        zzz = mont.select(~inf_mask, zzz, zero)
    return {"X": x, "Y": y, "ZZ": zz, "ZZZ": zzz}


def is_identity(p):
    return mont.is_zero(p["ZZ"])


def _mul(a, b):
    return mont.mont_mul(FQ, a, b)


def _sqr(a):
    return mont.mont_sqr(FQ, a)


def _add(a, b):
    return mont.add(FQ, a, b)


def _sub(a, b):
    return mont.sub(FQ, a, b)


def xyzz_double(p):
    """dbl-2008-s-1 (a = 0): 6M + 2S."""
    U = _add(p["Y"], p["Y"])
    V = _sqr(U)
    W = _mul(U, V)
    S = _mul(p["X"], V)
    XX = _sqr(p["X"])
    Mv = _add(_add(XX, XX), XX)
    X3 = _sub(_sqr(Mv), _add(S, S))
    Y3 = _sub(_mul(Mv, _sub(S, X3)), _mul(W, p["Y"]))
    ZZ3 = _mul(V, p["ZZ"])
    ZZZ3 = _mul(W, p["ZZZ"])
    return {"X": X3, "Y": Y3, "ZZ": ZZ3, "ZZZ": ZZZ3}


def xyzz_add(p, q):
    """add-2008-s-1 with full special-case handling (identity, equal,
    inverse): 12M + 2S + selects."""
    U1 = _mul(p["X"], q["ZZ"])
    U2 = _mul(q["X"], p["ZZ"])
    S1 = _mul(p["Y"], q["ZZZ"])
    S2 = _mul(q["Y"], p["ZZZ"])
    P = _sub(U2, U1)
    R = _sub(S2, S1)
    PP = _sqr(P)
    PPP = _mul(P, PP)
    Q = _mul(U1, PP)
    X3 = _sub(_sub(_sqr(R), PPP), _add(Q, Q))
    Y3 = _sub(_mul(R, _sub(Q, X3)), _mul(S1, PPP))
    ZZ3 = _mul(_mul(p["ZZ"], q["ZZ"]), PP)
    ZZZ3 = _mul(_mul(p["ZZZ"], q["ZZZ"]), PPP)
    added = {"X": X3, "Y": Y3, "ZZ": ZZ3, "ZZZ": ZZZ3}

    p_inf = is_identity(p)
    q_inf = is_identity(q)
    same_x = mont.is_zero(P)
    same_y = mont.is_zero(R)
    doubled = xyzz_double(p)

    out = {}
    inf_out = jnp.logical_and(same_x, jnp.logical_not(same_y))
    use_dbl = jnp.logical_and(same_x, same_y)
    for k in added:
        v = added[k]
        v = mont.select(use_dbl, doubled[k], v)
        if k in ("ZZ", "ZZZ"):
            v = mont.select(inf_out, jnp.zeros_like(v), v)
        v = mont.select(p_inf, q[k], v)
        v = mont.select(q_inf, p[k], v)
        out[k] = v
    return out


def xyzz_neg(p):
    return {"X": p["X"], "Y": mont.neg(FQ, p["Y"]), "ZZ": p["ZZ"],
            "ZZZ": p["ZZZ"]}


def xyzz_index(p, idx):
    return {k: jnp.take(v, idx, axis=0) for k, v in p.items()}


def xyzz_select(mask, p, q):
    return {k: mont.select(mask, p[k], q[k]) for k in p}


def xyzz_to_affine_host(p):
    """Pull a small xyzz batch to host and convert to Python-int affine
    tuples (or None) — the 'CPU collect' step, like the reference's
    msmcollect (`lib/PLONK/utils/msmcollect.cpp`)."""
    X = FQ.from_mont_host(np.asarray(p["X"]).reshape(-1, FQ.L))
    Y = FQ.from_mont_host(np.asarray(p["Y"]).reshape(-1, FQ.L))
    ZZ = FQ.from_mont_host(np.asarray(p["ZZ"]).reshape(-1, FQ.L))
    ZZZ = FQ.from_mont_host(np.asarray(p["ZZZ"]).reshape(-1, FQ.L))
    from ..params import Q_MOD
    out = []
    for x, y, zz, zzz in zip(X, Y, ZZ, ZZZ):
        if zz == 0:
            out.append(None)
        else:
            out.append((x * pow(zz, -1, Q_MOD) % Q_MOD,
                        y * pow(zzz, -1, Q_MOD) % Q_MOD))
    return out


def affine_points_to_device(points):
    """Python-int affine points [(x, y) | None] -> device arrays
    (x_mont (n,L), y_mont (n,L), inf_mask (n,))."""
    xs, ys, infs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(0)
            infs.append(True)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            infs.append(False)
    return (jnp.asarray(FQ.to_mont_host(xs)),
            jnp.asarray(FQ.to_mont_host(ys)),
            jnp.asarray(np.asarray(infs)))
