"""Pippenger MSM on device — TPU-native replacement for the sppark CUDA MSM
(`lib/PLONK/utils/zkp/cuda/msm/pippenger.cuh`).

XLA-first redesign (no data-dependent control flow, no segmented scans):
  * window digits = the scalar's 16-bit limbs (16 unsigned windows, zero
    extraction cost);
  * per window: sort points by digit; because digits are then sorted, every
    bucket is a contiguous run, so bucket sums are *differences of an
    UNSEGMENTED inclusive point-scan*: B_b = S[end_b-1] - S[start_b-1],
    where EC subtraction is a cheap y-negation — this replaces the
    reference's per-window counting sort + bucket accumulation kernels;
  * the point-scan is a multi-level lax.scan (chunked prefix sums) so the
    compiled body is a single xyzz add, ~2n adds of work per scan;
  * weighted bucket reduction sum_b b*B_b via two more point-scans over the
    bucket axis;
  * final ~16-point window fold on host (like the reference's CPU
    `msmcollect.cpp`).
"""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from ..fields import mont
from ..fields.mont import FR, FQ, U32
from ..curve import g1
from ..ref.curve import g1_add as host_g1_add, g1_double as host_g1_double

WINDOW_BITS = 16  # production default (digits == 16-bit scalar limbs)
SCAN_CHUNK = 128


def _stack(p_list):
    return {k: jnp.stack([p[k] for p in p_list]) for k in p_list[0]}


def point_scan(pts, chunk=SCAN_CHUNK):
    """Inclusive prefix scan of xyzz points along axis 0 (length n).
    Multi-level chunked scan: one tiny lax.scan body per level."""
    n = pts["X"].shape[0]
    if n == 1:
        return pts
    if n <= chunk:
        def body(carry, x):
            nxt = g1.xyzz_add(carry, x)
            return nxt, nxt
        zero = {k: v[0] * 0 for k, v in pts.items()}
        _, ys = jax.lax.scan(body, zero, pts)
        return ys
    pad = (-n) % chunk
    if pad:
        padded = {k: jnp.concatenate(
            [v, jnp.zeros((pad,) + v.shape[1:], dtype=v.dtype)], axis=0)
            for k, v in pts.items()}
    else:
        padded = pts
    m = (n + pad) // chunk
    # view as (m, chunk) -> scan over the chunk axis with batch m
    arranged = {k: v.reshape(m, chunk, *v.shape[1:]).swapaxes(0, 1)
                for k, v in padded.items()}

    def body(carry, x):
        nxt = g1.xyzz_add(carry, x)
        return nxt, nxt

    zero = {k: jnp.zeros((m,) + v.shape[2:], dtype=v.dtype)
            for k, v in arranged.items()}
    _, intra = jax.lax.scan(body, zero, arranged)  # (chunk, m, ...)
    chunk_totals = {k: v[-1] for k, v in intra.items()}  # (m, ...)
    chunk_prefix = point_scan(chunk_totals, chunk)
    # exclusive shift
    excl = {k: jnp.concatenate(
        [jnp.zeros((1,) + v.shape[1:], dtype=v.dtype), v[:-1]], axis=0)
        for k, v in chunk_prefix.items()}
    combined = g1.xyzz_add(
        {k: jnp.broadcast_to(v[None], intra[k].shape) for k, v in excl.items()},
        intra)
    out = {k: v.swapaxes(0, 1).reshape((n + pad,) + v.shape[2:])
           for k, v in combined.items()}
    return {k: v[:n] for k, v in out.items()}


def limbs16_to_digits(raw_limbs, window_bits):
    """(n, 16) 16-bit limbs -> (n, num_windows) digits of `window_bits` bits.
    window_bits must divide 16."""
    assert 16 % window_bits == 0
    if window_bits == 16:
        return raw_limbs
    per = 16 // window_bits
    mask = np.uint32((1 << window_bits) - 1)
    parts = [(raw_limbs >> (window_bits * i)) & mask for i in range(per)]
    return jnp.stack(parts, axis=-1).reshape(raw_limbs.shape[0], -1)


@partial(jax.jit, static_argnums=(4,))
def msm_window(x_mont, y_mont, inf_mask, digits_w, window_bits):
    """One Pippenger window -> single xyzz point (dict of (L,) arrays)."""
    n = digits_w.shape[0]
    B = 1 << window_bits
    order = jnp.argsort(digits_w)
    d_sorted = jnp.take(digits_w, order)
    pts = g1.xyzz_from_affine(
        jnp.take(x_mont, order, axis=0), jnp.take(y_mont, order, axis=0),
        jnp.take(inf_mask, order))
    # digit-0 points contribute nothing
    pts = g1.xyzz_select(d_sorted == 0, g1.xyzz_zero((n,)), pts)

    scan = point_scan(pts)
    # prepend identity so index arithmetic is uniform
    scan_p = {k: jnp.concatenate(
        [jnp.zeros((1,) + v.shape[1:], dtype=v.dtype), v], axis=0)
        for k, v in scan.items()}
    bounds = jnp.searchsorted(d_sorted, jnp.arange(B + 1, dtype=U32))
    hi = g1.xyzz_index(scan_p, bounds[1:])     # S[end_b - 1]
    lo = g1.xyzz_index(scan_p, bounds[:-1])    # S[start_b - 1]
    buckets = g1.xyzz_add(hi, g1.xyzz_neg(lo))  # (B,) bucket sums

    # weighted reduction: sum_{b>=1} b*B_b = sum_j suffix_j
    rev = {k: v[1:][::-1] for k, v in buckets.items()}  # b = B-1 .. 1
    suffix = point_scan(rev)
    total_scan = point_scan(suffix)
    return {k: v[-1] for k, v in total_scan.items()}


def msm_device(points_dev, raw_scalar_limbs, window_bits=WINDOW_BITS):
    """points_dev = (x_mont, y_mont, inf_mask); raw_scalar_limbs (n, 16)
    uint32 16-bit limbs of canonical scalars. Returns affine Python point."""
    x_mont, y_mont, inf_mask = points_dev
    digits = limbs16_to_digits(raw_scalar_limbs, window_bits)
    num_windows = digits.shape[1]
    window_points = []
    for w in range(num_windows):
        wp = msm_window(x_mont, y_mont, inf_mask, digits[:, w], window_bits)
        window_points.append(wp)
    batch = _stack(window_points)
    affine = g1.xyzz_to_affine_host(batch)
    acc = None
    for wp in reversed(affine):  # most-significant window first
        for _ in range(window_bits):
            acc = host_g1_double(acc)
        acc = host_g1_add(acc, wp)
    return acc


def msm(points, scalars_ints, window_bits=WINDOW_BITS):
    """Convenience: host points/scalars -> MSM result."""
    from ..fields.limb import ints_to_limbs
    from ..curve.g1 import affine_points_to_device
    dev = affine_points_to_device(points)
    digits = jnp.asarray(ints_to_limbs(
        [s % (1 << 256) for s in scalars_ints], 16))
    return msm_device(dev, digits, window_bits)
