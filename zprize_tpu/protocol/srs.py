"""SRS (powers-of-tau) generation on device.

The reference benches generate the SRS with arkworks on CPU (minutes at
2^24, `zprize_bench.rs:33`). Here: a host-built 8-bit window table
T[j][d] = d * 2^(8j) * G (8192 small scalar mults, cached to disk), then
P_i = sum_j T[j][digit_j(tau^i)] computed on device as gathers + a 5-level
xyzz tree fold — O(32 n) point adds, fully batched.

NOTE: a test/bench SRS with known tau (not a production ceremony), exactly
like the reference's locally-generated `KZG10::setup`.
"""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from ..params import R_MOD
from ..fields import mont
from ..fields.mont import FR, FQ, U32
from ..fields.limb import ints_to_limbs
from ..ops import poly as jpoly
from ..curve import g1
from ..ref.curve import G1_GEN, g1_mul, g2_mul, G2_GEN
from ..ref.kzg import SRS

M = R_MOD
CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".srs_cache")

WB = 8                  # window bits for the fixed-base table
NW = 32                 # 256 / 8 windows


def _window_table():
    """(NW, 256) affine points as ((NW,256,L), (NW,256,L), inf) host arrays."""
    path = os.path.join(CACHE_DIR, "g1_window_table.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    xs = np.zeros((NW, 1 << WB, FQ.L), dtype=np.uint32)
    ys = np.zeros((NW, 1 << WB, FQ.L), dtype=np.uint32)
    inf = np.zeros((NW, 1 << WB), dtype=bool)
    base = G1_GEN
    for j in range(NW):
        acc = None
        for d in range(1 << WB):
            if acc is None:
                inf[j, d] = True
            else:
                xs[j, d] = FQ.to_mont_host([acc[0]])[0]
                ys[j, d] = FQ.to_mont_host([acc[1]])[0]
            from ..ref.curve import g1_add
            acc = g1_add(acc, base)
        # base for next window: 2^8 * current base
        for _ in range(WB):
            from ..ref.curve import g1_double
            base = g1_double(base)
    os.makedirs(CACHE_DIR, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump((xs, ys, inf), f)
    return xs, ys, inf


@jax.jit
def _fold_points(tx, ty, tinf):
    """(m, NW, L) selected window points -> (m,) xyzz sums via tree fold."""
    pts = g1.xyzz_from_affine(tx, ty, tinf)   # dict of (m, NW, L)
    k = NW
    while k > 1:
        pts = g1.xyzz_add({kk: v[:, 0::2] for kk, v in pts.items()},
                          {kk: v[:, 1::2] for kk, v in pts.items()})
        k //= 2
    return {kk: v[:, 0] for kk, v in pts.items()}


def _xyzz_batch_to_affine_device(p):
    """Device xyzz -> affine (x_mont, y_mont, inf_mask) via batched inverse."""
    zz = p["ZZ"]
    zzz = p["ZZZ"]
    inf_mask = mont.is_zero(zz)
    zz_inv = mont.batch_inv(FQ, zz)
    zzz_inv = mont.batch_inv(FQ, zzz)
    x = mont.mont_mul(FQ, p["X"], zz_inv)
    y = mont.mont_mul(FQ, p["Y"], zzz_inv)
    return x, y, inf_mask


def device_srs(max_degree: int, tau: int = None, seed: int = 42,
               chunk: int = 1 << 14):
    """Build an SRS with device points. Returns (DevPoints, SRS-lite) where
    DevPoints = (x_mont, y_mont, inf_mask) arrays of n+1 points, and the
    SRS-lite carries h/beta_h for the verifier."""
    if tau is None:
        import random
        tau = random.Random(seed).randrange(1, R_MOD)
    n = max_degree + 1
    cache = os.path.join(CACHE_DIR, f"srs_{max_degree}_{seed}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        pts = (jnp.asarray(z["x"]), jnp.asarray(z["y"]), jnp.asarray(z["inf"]))
    else:
        xs_t, ys_t, inf_t = _window_table()
        xs_t = jnp.asarray(xs_t)
        ys_t = jnp.asarray(ys_t)
        inf_t = jnp.asarray(inf_t)
        # tau powers as raw 16-bit limbs -> 8-bit digits (n, 32)
        tau_m = jnp.asarray(FR.to_mont_host([tau]))[0]
        out_x = np.zeros((n, FQ.L), dtype=np.uint32)
        out_y = np.zeros((n, FQ.L), dtype=np.uint32)
        out_inf = np.zeros((n,), dtype=bool)
        pows = jpoly.powers(FR, tau_m, n)
        raw = mont.from_mont(FR, pows)            # (n, 16) 16-bit limbs
        lo = raw & np.uint32(0xFF)
        hi = raw >> np.uint32(8)
        digits = jnp.stack([lo, hi], axis=-1).reshape(n, NW)
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            d = digits[s:e]                       # (m, 32)
            sel_x = jax.vmap(lambda dj, tj: jnp.take(tj, dj, axis=0),
                             in_axes=(1, 0), out_axes=1)(d, xs_t)
            sel_y = jax.vmap(lambda dj, tj: jnp.take(tj, dj, axis=0),
                             in_axes=(1, 0), out_axes=1)(d, ys_t)
            sel_i = jax.vmap(lambda dj, tj: jnp.take(tj, dj, axis=0),
                             in_axes=(1, 0), out_axes=1)(d, inf_t)
            acc = _fold_points(sel_x, sel_y, sel_i)
            ax, ay, ai = _xyzz_batch_to_affine_device(acc)
            out_x[s:e] = np.asarray(ax)
            out_y[s:e] = np.asarray(ay)
            out_inf[s:e] = np.asarray(ai)
        os.makedirs(CACHE_DIR, exist_ok=True)
        np.savez(cache, x=out_x, y=out_y, inf=out_inf)
        pts = (jnp.asarray(out_x), jnp.asarray(out_y), jnp.asarray(out_inf))

    lite = SRS.__new__(SRS)
    lite.powers_of_g = None
    lite.h = G2_GEN
    lite.beta_h = g2_mul(G2_GEN, tau)
    return pts, lite, tau
