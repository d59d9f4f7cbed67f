"""SRS (powers-of-tau) generation on device.

The reference benches generate the SRS with arkworks on CPU (minutes at
2^24, `zprize_bench.rs:33`). Here: a host-built 8-bit window table
T[j][d] = d * 2^(8j) * G (8192 small scalar mults, cached to disk), then
P_i = sum_j T[j][digit_j(tau^i)] computed on device as one flat gather +
a 5-level xyzz tree fold — O(32 n) point adds, fully batched.

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
from ..ops import poly as jpoly
from ..curve import g1
from ..ref.curve import G1_GEN, g2_mul, G2_GEN
from ..ref.kzg import SRS

M = R_MOD
CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".srs_cache")

WB = 8                  # window bits for the fixed-base table
NW = 32                 # 256 / 8 windows


def _window_table():
    """Host affine window tables ((NW, 256, L) x, y, (NW, 256) inf)."""
    path = os.path.join(CACHE_DIR, "g1_window_table.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    xs = np.zeros((NW, 1 << WB, FQ.L), dtype=np.uint32)
    ys = np.zeros((NW, 1 << WB, FQ.L), dtype=np.uint32)
    inf = np.zeros((NW, 1 << WB), dtype=bool)
    base = G1_GEN
    from ..ref.curve import g1_add, g1_double
    for j in range(NW):
        acc = None
        for d in range(1 << WB):
            if acc is None:
                inf[j, d] = True
            else:
                xs[j, d] = FQ.to_mont_host([acc[0]])[:, 0]
                ys[j, d] = FQ.to_mont_host([acc[1]])[:, 0]
            acc = g1_add(acc, base)
        for _ in range(WB):
            base = g1_double(base)
    os.makedirs(CACHE_DIR, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump((xs, ys, inf), f)
    return xs, ys, inf


@jax.jit
def _select_fold(xs_flat, ys_flat, digits):
    """xs_flat (L, NW*256); digits (m, NW) -> xyzz sums dict (L, m)."""
    idx = (digits.astype(jnp.int32)
           + (jnp.arange(NW, dtype=jnp.int32) * 256)[None, :])
    flat_idx = idx.reshape(-1)
    sx = jnp.take(xs_flat, flat_idx, axis=1).reshape(FQ.L, -1, NW)
    sy = jnp.take(ys_flat, flat_idx, axis=1).reshape(FQ.L, -1, NW)
    pts = g1.xyzz_from_affine(sx, sy)      # (0,0) encodes identity
    return g1.xyzz_tree_sum(pts)


def device_srs(max_degree: int, tau: int = None, seed: int = 42,
               chunk: int = 1 << 16):
    """Build an SRS with device points. Returns (DevPoints, SRS-lite, tau)
    where DevPoints = (x_mont (L, n), y_mont (L, n), inf_mask (n,)) with
    identity == (0, 0), and the SRS-lite carries h/beta_h for the
    verifier."""
    if tau is None:
        import random
        tau = random.Random(seed).randrange(1, R_MOD)
    n = max_degree + 1
    cache = os.path.join(CACHE_DIR, f"srsL_{max_degree}_{seed}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        pts = (jnp.asarray(z["x"]), jnp.asarray(z["y"]), jnp.asarray(z["inf"]))
    else:
        xs_t, ys_t, inf_t = _window_table()
        # zero out infinity entries so (0,0) encodes identity on device
        xs_t = np.where(inf_t[..., None], 0, xs_t)
        ys_t = np.where(inf_t[..., None], 0, ys_t)
        xs_flat = jnp.asarray(
            xs_t.transpose(2, 0, 1).reshape(FQ.L, NW * 256))
        ys_flat = jnp.asarray(
            ys_t.transpose(2, 0, 1).reshape(FQ.L, NW * 256))
        tau_m = jnp.asarray(FR.scalar_mont(tau))
        pows = jpoly.powers(FR, tau_m, n)
        raw = mont.from_mont(FR, pows)            # (16, n) 16-bit limbs
        lo = raw & np.uint32(0xFF)
        hi = raw >> np.uint32(8)
        digits = jnp.stack([lo, hi], axis=1).reshape(NW, n).T  # (n, NW)
        out_x = np.zeros((FQ.L, n), dtype=np.uint32)
        out_y = np.zeros((FQ.L, n), dtype=np.uint32)
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            acc = _select_fold(xs_flat, ys_flat, digits[s:e])
            ax, ay = g1.xyzz_to_affine_device(acc)
            out_x[:, s:e] = np.asarray(ax)
            out_y[:, s:e] = np.asarray(ay)
        out_inf = np.all(out_x == 0, axis=0) & np.all(out_y == 0, axis=0)
        os.makedirs(CACHE_DIR, exist_ok=True)
        np.savez(cache, x=out_x, y=out_y, inf=out_inf)
        pts = (jnp.asarray(out_x), jnp.asarray(out_y), jnp.asarray(out_inf))

    lite = SRS.__new__(SRS)
    lite.powers_of_g = None
    lite.h = G2_GEN
    lite.beta_h = g2_mul(G2_GEN, tau)
    return pts, lite, tau
