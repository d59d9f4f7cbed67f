"""Vectorized Montgomery field arithmetic over 16-bit limbs (JAX).

TPU-native counterpart of the reference's CUDA `mont_t` CIOS kernels
(`lib/PLONK/utils/mont/cuda/ff/mont_t.cuh`) — but as array programs over
(..., L)-shaped uint32 tensors so XLA vectorizes across the batch on the VPU.

Invariants:
  * limbs are < 2^16 on entry/exit of every public op ("normalized");
  * values are in Montgomery form (x·R mod p, R = 2^(16 L)) unless the name
    says otherwise;
  * all public ops return fully reduced values (< p).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..params import R_MOD, Q_MOD
from .limb import int_to_limbs, ints_to_limbs, limbs_to_ints, LIMB_BITS, LIMB_MASK

U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)


class FieldCtx:
    """Static field configuration (captured as compile-time constants)."""

    def __init__(self, mod: int, L: int, name: str):
        self.mod = mod
        self.L = L
        self.name = name
        self.R = (1 << (LIMB_BITS * L)) % mod
        self.R2 = (self.R * self.R) % mod
        # n0 = -mod^{-1} mod 2^16
        self.n0 = np.uint32((-pow(mod, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
        self.mod_limbs = int_to_limbs(mod, L)
        self.r2_limbs = int_to_limbs(self.R2, L)
        self.one_mont = int_to_limbs(self.R, L)          # 1 in Montgomery form
        self.zero = np.zeros(L, dtype=np.uint32)
        # exponent bits for Fermat inversion (p-2), little-endian
        self.inv_exp_bits = [(mod - 2) >> i & 1 for i in range((mod - 2).bit_length())]

    # ---------------- host conversions ----------------
    def to_mont_host(self, xs) -> np.ndarray:
        """Python ints -> Montgomery limb array (n, L) on host."""
        return ints_to_limbs([x * self.R % self.mod for x in xs], self.L)

    def from_mont_host(self, arr) -> list:
        rinv = pow(self.R, -1, self.mod)
        return [v * rinv % self.mod for v in limbs_to_ints(np.asarray(arr))]

    def raw_to_limbs_host(self, xs) -> np.ndarray:
        return ints_to_limbs([x % self.mod for x in xs], self.L)


FR = FieldCtx(R_MOD, 16, "fr")
FQ = FieldCtx(Q_MOD, 24, "fq")


# ---------------------------------------------------------------------------
# low-level limb helpers (all shapes (..., L), uint32)
# ---------------------------------------------------------------------------

def _normalize(t, L):
    """Carry-propagate an (..., K>=L) column vector to L 16-bit limbs.
    Caller guarantees the value fits in L limbs."""
    outs = []
    carry = jnp.zeros_like(t[..., 0])
    for k in range(L):
        v = t[..., k] + carry
        outs.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(outs, axis=-1)


def _sub_limbs(a, b, L):
    """(a - b) mod 2^(16L), plus final borrow flag (1 if a < b)."""
    outs = []
    borrow = jnp.zeros_like(a[..., 0])
    top = np.uint32(1 << LIMB_BITS)
    for k in range(L):
        d = a[..., k] + top - b[..., k] - borrow
        outs.append(d & MASK)
        borrow = jnp.uint32(1) - (d >> LIMB_BITS)
    return jnp.stack(outs, axis=-1), borrow


def _add_limbs(a, b, L):
    outs = []
    carry = jnp.zeros_like(a[..., 0])
    for k in range(L):
        v = a[..., k] + b[..., k] + carry
        outs.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(outs, axis=-1), carry


def _cond_sub_mod(cfg, a, extra_carry=None):
    """Subtract mod once if a >= mod (a < 2*mod assumed). `extra_carry` is a
    1-valued flag meaning a has an implicit 2^(16L) term."""
    mod = jnp.asarray(cfg.mod_limbs, dtype=U32)
    diff, borrow = _sub_limbs(a, jnp.broadcast_to(mod, a.shape), cfg.L)
    if extra_carry is not None:
        take_diff = jnp.logical_or(borrow == 0, extra_carry != 0)
    else:
        take_diff = borrow == 0
    return jnp.where(take_diff[..., None], diff, a)


# ---------------------------------------------------------------------------
# public field ops
# ---------------------------------------------------------------------------

def add(cfg, a, b):
    s, carry = _add_limbs(a, b, cfg.L)
    return _cond_sub_mod(cfg, s, extra_carry=carry)


def sub(cfg, a, b):
    d, borrow = _sub_limbs(a, b, cfg.L)
    mod = jnp.asarray(cfg.mod_limbs, dtype=U32)
    d2, _ = _add_limbs(d, jnp.broadcast_to(mod, d.shape), cfg.L)
    return jnp.where((borrow != 0)[..., None], d2, d)


def neg(cfg, a):
    mod = jnp.asarray(cfg.mod_limbs, dtype=U32)
    d, _ = _sub_limbs(jnp.broadcast_to(mod, a.shape), a, cfg.L)
    # neg(0) must be 0, not mod
    is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    return jnp.where(is_zero, a, d)


_DIAG_IDX_CACHE = {}


def _diag_index(L):
    """(L, 2L+1) gather indices that place row i's L limb-products at columns
    i..i+L (column j of the padded row ends up at output col i+j)."""
    if L not in _DIAG_IDX_CACHE:
        i = np.arange(L)[:, None]
        k = np.arange(2 * L + 1)[None, :]
        idx = (k - i) % (2 * L + 1)
        _DIAG_IDX_CACHE[L] = idx.astype(np.int32)  # keep as numpy (trace-safe)
    return jnp.asarray(_DIAG_IDX_CACHE[L])


def _mul_columns(a, b, L):
    """Full product column sums: out[..., k] = sum_{i+j=k} a_i*b_j, split
    into 16-bit lo/hi contributions (each column < 2L * 2^16 << 2^32).
    Vectorized: outer product + anti-diagonal gather + reduce (no per-limb
    Python loop, so the HLO stays small)."""
    p = a[..., :, None] * b[..., None, :]          # (..., L, L) exact u32
    lo = p & MASK
    hi = p >> LIMB_BITS
    width = 2 * L + 1
    zpad = jnp.zeros(p.shape[:-1] + (width - L,), dtype=U32)
    lo_p = jnp.concatenate([lo, zpad], axis=-1)
    hi_p = jnp.concatenate([hi, zpad], axis=-1)
    idx = jnp.broadcast_to(_diag_index(L), lo_p.shape)
    lo_r = jnp.take_along_axis(lo_p, idx, axis=-1)
    hi_r = jnp.take_along_axis(hi_p, idx, axis=-1)
    t = jnp.sum(lo_r, axis=-2) + jnp.sum(jnp.roll(hi_r, 1, axis=-1), axis=-2)
    return t


def mont_mul(cfg, a, b):
    """Montgomery product: a*b*R^{-1} mod p. Schoolbook columns + CIOS
    reduction; every intermediate column stays far below 2^32."""
    L = cfg.L
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (L,))
    b = jnp.broadcast_to(b, shape + (L,))
    t = _mul_columns(a, b, L)

    mod = jnp.asarray(cfg.mod_limbs, dtype=U32)
    for k in range(L):
        m = ((t[..., k] & MASK) * cfg.n0) & MASK
        p = m[..., None] * mod
        lo = p & MASK
        hi = p >> LIMB_BITS
        t = t.at[..., k:k + L].add(lo)
        t = t.at[..., k + 1:k + L + 1].add(hi)
        # column k is now divisible by 2^16: push its carry up
        t = t.at[..., k + 1].add(t[..., k] >> LIMB_BITS)

    r = _normalize(t[..., L:2 * L + 1], L + 1)
    hi_limb = r[..., L]
    r = r[..., :L]
    return _cond_sub_mod(cfg, r, extra_carry=hi_limb)


def mont_sqr(cfg, a):
    return mont_mul(cfg, a, a)


def mont_pow_fixed(cfg, a, exp_bits_le):
    """a^e with a compile-time exponent (square-and-multiply, LSB-first).
    Uses a rolled fori_loop so the compiled graph stays small (one mont_mul +
    one mont_sqr body) instead of ~2*255 unrolled multiplies."""
    bits = jnp.asarray(np.asarray(exp_bits_le, dtype=np.uint32))
    one = jnp.broadcast_to(jnp.asarray(cfg.one_mont, dtype=U32), a.shape)

    def body(i, state):
        acc, base = state
        mul = mont_mul(cfg, acc, base)
        acc = jnp.where(bits[i] != 0, mul, acc)
        base = mont_sqr(cfg, base)
        return acc, base

    acc, _ = jax.lax.fori_loop(0, len(exp_bits_le), body, (one, a))
    return acc


def inv(cfg, a):
    """Fermat inversion a^(p-2). Zero maps to zero."""
    return mont_pow_fixed(cfg, a, cfg.inv_exp_bits)


def batch_inv(cfg, a):
    """Montgomery batched inversion along axis 0 of (n, L): one Fermat chain
    for the whole batch (counterpart of the GPU's n-point `inv_mod` usage)."""
    n = a.shape[0]
    one = jnp.asarray(cfg.one_mont, dtype=U32)
    is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    safe = jnp.where(is_zero, one, a)

    def body(carry, x):
        nxt = mont_mul(cfg, carry, x)
        return nxt, carry  # exclusive prefix

    total, prefix = jax.lax.scan(body, one, safe)
    total_inv = inv(cfg, total[None])[0]

    def body2(carry, xs):
        x, pre = xs
        out = mont_mul(cfg, carry, pre)
        carry = mont_mul(cfg, carry, x)
        return carry, out

    _, out = jax.lax.scan(body2, total_inv, (safe, prefix), reverse=True)
    return jnp.where(is_zero, jnp.zeros_like(a), out)


def to_mont(cfg, a_raw):
    return mont_mul(cfg, a_raw, jnp.asarray(cfg.r2_limbs, dtype=U32))


def from_mont(cfg, a):
    one_raw = jnp.zeros(cfg.L, dtype=U32).at[0].set(1)
    return mont_mul(cfg, a, one_raw)


def select(mask, a, b):
    """mask: (...,) bool -> elementwise select over limb arrays."""
    return jnp.where(mask[..., None], a, b)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)
