"""Pippenger MSM on device — TPU-native replacement for the sppark CUDA MSM
(`lib/PLONK/utils/zkp/cuda/msm/pippenger.cuh`).

XLA/Pallas-first redesign with NO sequential scans and NO data-dependent
shapes:

  * window digits = the scalar's 16-bit limbs (or 8/4-bit splits);
  * per window: argsort points by digit — every bucket becomes a contiguous
    run of the sorted order; ONE gather places the run contents into a
    static (B, C) slot grid (C = static per-bucket capacity, sized so the
    overflow probability for field-pseudorandom scalars is ~e^-50; actual
    overflow is *detected* and reported so callers can retry with a larger
    capacity — never silent);
  * bucket sums: log-depth pairwise tree over the capacity axis (first
    level = fused affine+affine Pallas kernel, then xyzz+xyzz);
  * weighted reduction  sum_b b*B_b  via a 2-level digit split (row/col
    tree sums + short Hillis-Steele suffix scans) — O(B) adds, log depth;
  * per-window points -> one batched affine conversion -> tiny D2H -> host
    window fold (like the reference's CPU `msmcollect.cpp`).

The whole per-window pipeline runs as ONE jitted lax.scan over windows.
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import mont
from ..fields.mont import FR, FQ, U32
from ..curve import g1
from ..ref.curve import g1_add as host_g1_add, g1_double as host_g1_double

WINDOW_BITS = 16


def auto_window_bits(n):
    if n >= (1 << 19):
        return 16
    if n >= (1 << 9):
        return 8
    return 4


def bucket_capacity(n, window_bits):
    """Static per-bucket slot count: mu + 8*sqrt(mu) + 16 (Poisson tail
    ~e^-50 for random digits), rounded up to a multiple of 8."""
    B = 1 << window_bits
    mu = max(1.0, n / B)
    c = int(math.ceil(mu + 8.0 * math.sqrt(mu) + 16.0))
    c = min(n, c)
    return -(-c // 8) * 8


def limbs16_to_digits(raw_limbs, window_bits):
    """(16, n) 16-bit limbs -> (num_windows, n) digits of `window_bits`
    bits. window_bits must divide 16."""
    assert 16 % window_bits == 0
    if window_bits == 16:
        return raw_limbs
    per = 16 // window_bits
    mask = np.uint32((1 << window_bits) - 1)
    parts = [(raw_limbs >> np.uint32(window_bits * i)) & mask
             for i in range(per)]
    # window order: limb 0 low bits first
    stacked = jnp.stack(parts, axis=1)          # (16, per, n)
    return stacked.reshape(-1, raw_limbs.shape[1])


def _tree_sum_last(p):
    """xyzz dict (L, ..., m) -> (L, ...): log-depth pairwise sum; first
    input level must already be xyzz."""
    return g1.xyzz_tree_sum(p)


def _suffix_weighted_small(S):
    """S: xyzz (L, B) with B small (<= 512). Returns sum_{b>=1} b * S_b.
    Hillis-Steele inclusive suffix scan + tree sum of suffixes. Both are
    fori_loops over stride-doubling steps so the compiled graph holds one
    xyzz_add each (XLA compile stays O(1) in B)."""
    B = S["X"].shape[-1]
    rev = {k: v[..., ::-1] for k, v in S.items()}   # b = B-1 .. 0
    idx = jnp.arange(B)

    def body(i, acc):
        d = jnp.left_shift(jnp.int32(1), i)
        shifted = {k: jnp.where(idx >= d, jnp.roll(v, d, axis=-1),
                                jnp.zeros_like(v)) for k, v in acc.items()}
        return g1.xyzz_add(acc, shifted)

    rev = jax.lax.fori_loop(0, (B - 1).bit_length(), body, rev)
    # rev[k] = suffix_{B-1-k}; want sum over suffix_j for j = 1..B-1
    return _tree_sum_last({k: v[..., :B - 1] for k, v in rev.items()})


def _double_k(p, k):
    for _ in range(k):
        p = g1.xyzz_double(p)
    return p


def weighted_bucket_fold(S):
    """sum_b b * S_b over the last axis of an xyzz dict (L, B). For large B
    splits b = b2*256 + b1: = 256 * sum b2*R_b2 + sum b1*C_b1."""
    B = S["X"].shape[-1]
    if B <= 512:
        return _suffix_weighted_small(S)
    B1 = 256
    B2 = B // B1
    G = {k: v.reshape(v.shape[:-1] + (B2, B1)) for k, v in S.items()}
    rows = _tree_sum_last(G)                                   # (L, B2)
    cols = _tree_sum_last({k: jnp.swapaxes(v, -1, -2) for k, v in G.items()})
    hi = _suffix_weighted_small(rows)
    lo = _suffix_weighted_small(cols)
    return g1.xyzz_add(_double_k(hi, 8), lo)


def msm_window_grid(x_mont, y_mont, digits_w, window_bits, capacity,
                    off=0):
    """One Pippenger window. x/y (L, n) Montgomery affine with (0,0)
    identity; digits_w (n,) u32. Returns (xyzz point dict of (L,) arrays,
    overflow count).

    `off` (int or traced i32 scalar) is the PASS OFFSET: slots
    [off, off+C) of each bucket's sorted run are accumulated, and the
    returned overflow counts the members beyond off+C. Static capacity is
    Poisson-sized for pseudorandom digits; structured scalars (selector
    polys have coefficient values repeated in pairs — measured worst
    bucket 2.03x the Poisson cap at h13) are handled by the caller
    re-running the SAME compiled program with off += C and point-adding
    the per-pass results — never by recompiling a bigger grid."""
    n = digits_w.shape[0]
    B = 1 << window_bits
    C = capacity
    off = jnp.asarray(off, dtype=jnp.int32)
    order = jnp.argsort(digits_w)
    d_s = jnp.take(digits_w, order)
    bounds = jnp.searchsorted(d_s, jnp.arange(B + 1, dtype=U32)).astype(
        jnp.int32)
    starts = bounds[:B] + off
    ends = bounds[1:]
    slot = starts[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]  # (B, C)
    valid = slot < ends[:, None]
    valid = valid & (jnp.arange(B, dtype=U32) > 0)[:, None]
    src = jnp.take(order, jnp.clip(slot, 0, n - 1).reshape(-1))
    gx = jnp.take(x_mont, src, axis=1).reshape(FQ.L, B, C)
    gy = jnp.take(y_mont, src, axis=1).reshape(FQ.L, B, C)
    vm = valid[None]
    gx = jnp.where(vm, gx, jnp.zeros_like(gx))
    gy = jnp.where(vm, gy, jnp.zeros_like(gy))

    # overflow: real (nonzero-digit) bucket members beyond this pass
    over = jnp.maximum(ends - starts - C, 0)
    overflow = jnp.sum(jnp.where(jnp.arange(B) > 0, over, 0))

    # tree reduce capacity axis: first level affine+affine
    if C > 1:
        p = g1.xyzz_add_affine2(gx[..., 0::2], gy[..., 0::2],
                                gx[..., 1::2], gy[..., 1::2])
        p = _tree_sum_last(p)
    else:
        p = g1.xyzz_from_affine(gx[..., 0], gy[..., 0])
    # p: (L, B) bucket sums
    w = weighted_bucket_fold(p)
    return w, overflow


def window_group_size(n, window_bits, max_windows):
    """Windows per scan step for the grouped grid: as many as fit a
    ~2^21-slot gather budget (the batched-affine level inversions amortize
    over the whole group), a power of two, at least 1."""
    B = 1 << window_bits
    C = bucket_capacity(n, window_bits)
    g = max(1, int(2 ** 21) // (B * C))
    g = 1 << (g.bit_length() - 1)
    return min(g, max_windows)


def msm_window_grid_batch(x_mont, y_mont, digits_gw, window_bits, capacity,
                          off=0):
    """G Pippenger windows at once: digits_gw (G, n). The per-bucket slot
    grid is (G, B, C); bucket accumulation is a batched-AFFINE pairwise
    tree (one in-graph batched inversion per level, shared by the whole
    group — ~7 fq-mul per point-add vs ~14 in xyzz). Returns (xyzz dict of
    (L, G) window points, (G,) overflow counts). `off` is the pass offset
    (see msm_window_grid): callers drain overflowing buckets by re-running
    with off += C and adding the window points."""
    G, n = digits_gw.shape
    B = 1 << window_bits
    C = capacity
    off = jnp.asarray(off, dtype=jnp.int32)
    order = jnp.argsort(digits_gw, axis=-1)                    # (G, n)
    d_s = jnp.take_along_axis(digits_gw, order, axis=-1)
    targets = jnp.arange(B + 1, dtype=U32)
    bounds = jax.vmap(
        lambda row: jnp.searchsorted(row, targets))(d_s).astype(jnp.int32)
    starts = bounds[:, :B] + off                               # (G, B)
    ends = bounds[:, 1:]
    slot = starts[:, :, None] + jnp.arange(C, dtype=jnp.int32)[None, None, :]
    valid = slot < ends[:, :, None]                            # (G, B, C)
    valid = valid & (jnp.arange(B, dtype=U32) > 0)[None, :, None]
    src = jnp.take_along_axis(
        order, jnp.clip(slot, 0, n - 1).reshape(G, -1), axis=-1)
    gx = jnp.take(x_mont, src.reshape(-1), axis=1).reshape(FQ.L, G, B, C)
    gy = jnp.take(y_mont, src.reshape(-1), axis=1).reshape(FQ.L, G, B, C)
    vm = valid[None]
    gx = jnp.where(vm, gx, jnp.zeros_like(gx))
    gy = jnp.where(vm, gy, jnp.zeros_like(gy))

    over = jnp.maximum(ends - starts - C, 0)
    overflow = jnp.sum(
        jnp.where((jnp.arange(B) > 0)[None, :], over, 0), axis=1)   # (G,)

    bx, by = g1.affine_tree_sum(gx, gy)                        # (L, G, B)
    p = g1.xyzz_from_affine(bx, by)
    w = weighted_bucket_fold(p)                                # (L, G)
    return w, overflow


def _msm_jit_body(x_mont, y_mont, digits, off, window_bits, capacity):
    """lax.scan over windows; returns (stacked window xyzz (W,L) dict,
    (W,) overflow beyond slots [off, off+capacity))."""
    def body(carry, d_w):
        pt, over = msm_window_grid(x_mont, y_mont, d_w, window_bits,
                                   capacity, off)
        return carry, (pt, over)

    _, (pts, over) = jax.lax.scan(body, 0, digits)
    return pts, over


_msm_jit = jax.jit(_msm_jit_body, static_argnums=(4, 5))


@jax.jit
def _xyzz_acc_jit(p, q):
    """Accumulate per-pass window points (tiny (L, W)-shaped adds) — XLA
    path: a pallas kernel at these widths would be a pointless extra
    remote compile."""
    with mont.xla_only():
        return g1.xyzz_add(p, q)


def msm_window_xyzz(points_dev, raw_scalar_limbs, window_bits=None,
                    capacity=None):
    """Run all windows on device; returns (xyzz dict of (L, W) arrays,
    window_bits). Overflowing buckets (scalar distributions worse than the
    Poisson sizing) are drained by extra passes of the SAME compiled
    program at off += capacity — no recompilation, no host retry of the
    whole MSM."""
    x_mont, y_mont = points_dev[0], points_dev[1]
    n = x_mont.shape[1]
    if window_bits is None:
        window_bits = auto_window_bits(n)
    digits = limbs16_to_digits(raw_scalar_limbs, window_bits)
    cap = capacity or bucket_capacity(n, window_bits)
    total = None
    off = 0
    while True:
        pts, over = _msm_jit(x_mont, y_mont, digits, jnp.int32(off),
                             window_bits, cap)
        # scan stacked along leading axis: (W, L) -> limbs-leading (L, W)
        ptsT = {k: jnp.swapaxes(v, 0, 1) for k, v in pts.items()}
        total = ptsT if total is None else _xyzz_acc_jit(total, ptsT)
        if off >= n or not int(np.asarray(over).sum()):
            break
        off += cap
    return total, window_bits


def msm_window_points(points_dev, raw_scalar_limbs, window_bits=None,
                      capacity=None):
    """As msm_window_xyzz but returns device affine (x (L,W), y (L,W))."""
    ptsT, wb = msm_window_xyzz(points_dev, raw_scalar_limbs, window_bits,
                               capacity)
    ax, ay = g1.xyzz_to_affine_device(ptsT)
    return (ax, ay), wb


def msm_device(points_dev, raw_scalar_limbs, window_bits=None,
               capacity=None):
    """points_dev = (x_mont, y_mont[, inf_mask]) with identity == (0,0);
    raw_scalar_limbs (16, n) uint32 16-bit limbs of canonical scalars.
    Returns affine Python point (or None). The ~W window points are pulled
    as xyzz (tiny D2H) and folded on host with Python-int arithmetic
    (reference `msmcollect.cpp`) — no device inversions on this path."""
    ptsT, wb = msm_window_xyzz(points_dev, raw_scalar_limbs, window_bits,
                               capacity)
    wins = g1.xyzz_to_affine_host(ptsT)
    acc = None
    for wp in reversed(wins):                        # MSB window first
        for _ in range(wb):
            acc = host_g1_double(acc)
        acc = host_g1_add(acc, wp)
    return acc


def msm(points, scalars_ints, window_bits=None):
    """Convenience: host points/scalars -> MSM result."""
    from ..fields.limb import ints_to_limbs
    from ..curve.g1 import affine_points_to_device
    dev = affine_points_to_device(points)
    digits = jnp.asarray(ints_to_limbs(
        [s % (1 << 256) for s in scalars_ints], 16).T.copy())
    return msm_device(dev, digits, window_bits)
