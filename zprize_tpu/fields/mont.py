"""Vectorized Montgomery field arithmetic over 16-bit limbs (JAX).

TPU-native counterpart of the reference's CUDA `mont_t` CIOS kernels
(`lib/PLONK/utils/mont/cuda/ff/mont_t.cuh`).

Layout contract (round 2): field tensors are **limbs-leading** —
`(L, *batch)` uint32 arrays with 16-bit limbs — so the batch axis sits on
the TPU's 128-lane minor dimension. (The round-1 `(batch, L)` layout
padded the 16/24-limb minor axis to 128 lanes: 8x wasted HBM traffic and
footprint.) Scalars are `(L,)`.

Two backends, selected per-platform (env `ZPRIZE_BACKEND=pallas|xla|auto`):
  * `pallas` (TPU): fused kernels in `pkern.py`, all limb temporaries in
    VMEM;
  * `xla` (CPU tests / fallback): fully vectorized array programs — product
    columns via shifted accumulation, non-interleaved REDC, Kogge-Stone
    log-depth carry resolution.

`batch_inv` is a log-depth up/down product tree with the single final
inversion done on HOST (64-byte round-trip + Python `pow`): the Fermat
ladder would cost ~255 sequential device ops, the round-trip costs ~1 ms.
Consequently `batch_inv`/`inv` must be called OUTSIDE jit.
"""

import contextlib
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..params import R_MOD, Q_MOD
from .limb import int_to_limbs, ints_to_limbs, limbs_to_ints, LIMB_BITS
from . import limbmath
from . import pkern

U32 = jnp.uint32
MASK = np.uint32((1 << LIMB_BITS) - 1)


class FieldCtx:
    """Static field configuration (compile-time constants)."""

    def __init__(self, mod: int, L: int, name: str):
        self.mod = mod
        self.L = L
        self.name = name
        self.R = (1 << (LIMB_BITS * L)) % mod
        self.R2 = (self.R * self.R) % mod
        n_prime = (-pow(mod, -1, 1 << (LIMB_BITS * L))) % (1 << (LIMB_BITS * L))
        self.nprime_limbs = int_to_limbs(n_prime, L)   # -mod^-1 mod R
        self.mod_limbs = int_to_limbs(mod, L)
        self.r2_limbs = int_to_limbs(self.R2, L)
        self.one_mont = int_to_limbs(self.R, L)
        self.inv_exp_bits = [(mod - 2) >> i & 1
                             for i in range((mod - 2).bit_length())]
        self.P = limbmath.LimbParams(mod, L)
        self.K = pkern.KCfg(mod, L, name)

    # ---------------- host conversions (limbs-leading) ----------------
    def to_mont_host(self, xs) -> np.ndarray:
        """ints -> (L, len(xs)) uint32 Montgomery limbs."""
        return ints_to_limbs([x * self.R % self.mod for x in xs],
                             self.L).T.copy()

    def from_mont_host(self, arr) -> list:
        """(L, m) Montgomery limbs -> list of ints."""
        rinv = pow(self.R, -1, self.mod)
        a = np.asarray(arr)
        return [v * rinv % self.mod for v in limbs_to_ints(a.T)]

    def raw_to_limbs_host(self, xs) -> np.ndarray:
        return ints_to_limbs([x % self.mod for x in xs], self.L).T.copy()

    def scalar_mont(self, x: int) -> np.ndarray:
        """single int -> (L,) Montgomery limbs."""
        return self.to_mont_host([x % self.mod])[:, 0]


FR = FieldCtx(R_MOD, 16, "fr")
FQ = FieldCtx(Q_MOD, 24, "fq")

_BACKEND = None
_FORCE_XLA = 0


def backend() -> str:
    global _BACKEND
    if _BACKEND is None:
        e = os.environ.get("ZPRIZE_BACKEND", "auto")
        if e == "auto":
            e = "pallas" if jax.default_backend() != "cpu" else "xla"
        _BACKEND = e
    return "xla" if _FORCE_XLA else _BACKEND


@contextlib.contextmanager
def xla_only():
    """Route field ops through the XLA fallback. Required around
    `jax.ensure_compile_time_eval()` table builders: pallas_call cannot be
    traced under compile-time eval (kernel constants error)."""
    global _FORCE_XLA
    _FORCE_XLA += 1
    try:
        yield
    finally:
        _FORCE_XLA -= 1


def _pl(cfg, fn, *arrays, n_out=1):
    """Flatten (L*, *batch) arrays to 2D, run a pkern op, restore batch."""
    batch = arrays[0].shape[1:]
    flat = [a.reshape(a.shape[0], -1) if a.ndim != 2 else a for a in arrays]
    out = fn(cfg.K, *flat)
    if n_out == 1:
        return out.reshape(out.shape[0], *batch) if len(batch) != 1 else out
    return [o.reshape(o.shape[0], *batch) if len(batch) != 1 else o
            for o in out]


# ---------------------------------------------------------------------------
# XLA fallback machinery — the algorithms live in `limbmath.py` (shared
# with the Pallas kernel bodies); this layer only broadcasts and jit-shares
# ---------------------------------------------------------------------------

def _bc2(cfg, a, b):
    """Broadcast two (L, *batch) operands to a common batch shape (batch
    dims align trailing; leading 1s are inserted after the limb axis)."""
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

    def bc(x):
        pad = len(shape) - (x.ndim - 1)
        if pad:
            x = x.reshape(x.shape[:1] + (1,) * pad + x.shape[1:])
        return jnp.broadcast_to(x, (x.shape[0],) + shape)

    return bc(a), bc(b)


def _xla_add(cfg, a, b):
    return limbmath.add(cfg.P, a, b)


def _xla_sub(cfg, a, b):
    return limbmath.sub(cfg.P, a, b)


def _xla_neg(cfg, a):
    return limbmath.neg(cfg.P, a)


def _xla_mul(cfg, a, b):
    return limbmath.mul(cfg.P, a, b, stacked=True)


# jit-shared entry points: every call site becomes ONE pjit call instead of
# ~10^2 inlined limb eqns — round-1 measured 11x faster jaxpr->MLIR lowering
# (NOTES_ROUND1.md). FieldCtx instances are singletons (identity hash).
_xla_mul_j = jax.jit(_xla_mul, static_argnums=0)
_xla_add_j = jax.jit(_xla_add, static_argnums=0)
_xla_sub_j = jax.jit(_xla_sub, static_argnums=0)
_xla_neg_j = jax.jit(_xla_neg, static_argnums=0)


# ---------------------------------------------------------------------------
# public ops — (L, *batch) in/out, backend-dispatched
# ---------------------------------------------------------------------------

def add(cfg, a, b):
    a, b = _bc2(cfg, a, b)
    if backend() == "pallas" and a.ndim >= 2:
        return _pl(cfg, pkern.add, a, b)
    return _xla_add_j(cfg, a, b)


def sub(cfg, a, b):
    a, b = _bc2(cfg, a, b)
    if backend() == "pallas" and a.ndim >= 2:
        return _pl(cfg, pkern.sub, a, b)
    return _xla_sub_j(cfg, a, b)


def neg(cfg, a):
    if backend() == "pallas" and a.ndim >= 2:
        return _pl(cfg, pkern.neg, a)
    return _xla_neg_j(cfg, a)


def mont_mul(cfg, a, b):
    a, b = _bc2(cfg, a, b)
    if backend() == "pallas" and a.ndim >= 2:
        return _pl(cfg, pkern.mul, a, b)
    return _xla_mul_j(cfg, a, b)


def mont_sqr(cfg, a):
    return mont_mul(cfg, a, a)


def butterfly(cfg, u, v, w):
    """(u + v*w, u - v*w) — fused on TPU."""
    u, v = _bc2(cfg, u, v)
    v, w = _bc2(cfg, v, w)
    u, v = _bc2(cfg, u, v)
    if backend() == "pallas" and u.ndim >= 2:
        return tuple(_pl(cfg, pkern.mul_add_sub, u, v, w, n_out=2))
    vw = _xla_mul_j(cfg, v, w)
    return _xla_add_j(cfg, u, vw), _xla_sub_j(cfg, u, vw)


def mont_pow_fixed(cfg, a, exp_bits_le):
    """a^e, compile-time exponent, rolled fori_loop (XLA path only; on TPU
    use batch_inv / host pow instead)."""
    bits = jnp.asarray(np.asarray(exp_bits_le, dtype=np.uint32))
    one = jnp.broadcast_to(
        jnp.asarray(cfg.one_mont, dtype=U32).reshape(
            (cfg.L,) + (1,) * (a.ndim - 1)), a.shape)

    def body(i, state):
        acc, base = state
        mul = _xla_mul_j(cfg, acc, base)
        acc = jnp.where(bits[i] != 0, mul, acc)
        base = _xla_mul_j(cfg, base, base)
        return acc, base

    acc, _ = jax.lax.fori_loop(0, len(exp_bits_le), body, (one, a))
    return acc


def inv(cfg, a):
    """Inverse of (L, *batch); zero maps to zero. NOT jit-safe on TPU
    (host round-trip for the final inversion)."""
    if a.ndim == 1:
        return batch_inv(cfg, a[:, None])[:, 0]
    return batch_inv(cfg, a)


def _pad_pow2(cfg, flat):
    """Pad (L, n) to the next power of two with Montgomery ones."""
    n = flat.shape[1]
    n_pad = 1 << max(0, (n - 1)).bit_length() if n > 1 else 1
    if n_pad != n:
        one = jnp.asarray(cfg.one_mont, dtype=U32)
        pad = jnp.broadcast_to(one[:, None], (cfg.L, n_pad - n))
        flat = jnp.concatenate([flat, pad], axis=1)
    return flat


def prod_tree_total(cfg, a):
    """Product of all elements over the batch axes of (L, *batch) via a
    log-depth pairwise tree -> (L,). Traceable (jit-safe); no zeros
    handling."""
    cur = _pad_pow2(cfg, a.reshape(cfg.L, -1))
    while cur.shape[1] > 1:
        cur = mont_mul(cfg, cur[:, 0::2], cur[:, 1::2])
    return cur[:, 0]


def inv_apply(cfg, a, inv_total):
    """Elementwise inverses of (L, *batch) given the Montgomery inverse of
    the total product (inv_total (L,), e.g. from a host `pow`). Traceable;
    the up-tree is rebuilt in-graph (values must match prod_tree_total's).
    No zeros handling — elements must be units."""
    batch = a.shape[1:]
    flat = a.reshape(cfg.L, -1)
    n = flat.shape[1]
    safe = _pad_pow2(cfg, flat)

    levels = [safe]
    cur = safe
    while cur.shape[1] > 1:
        cur = mont_mul(cfg, cur[:, 0::2], cur[:, 1::2])
        levels.append(cur)

    inv_cur = inv_total[:, None]
    for lvl in range(len(levels) - 2, -1, -1):
        vals = levels[lvl]
        left = mont_mul(cfg, inv_cur, vals[:, 1::2])
        right = mont_mul(cfg, inv_cur, vals[:, 0::2])
        inv_cur = jnp.stack([left, right], axis=2).reshape(
            cfg.L, vals.shape[1])

    return inv_cur[:, :n].reshape((cfg.L,) + batch)


def inv_in_graph(cfg, a):
    """Batched inversion of (L, *batch), FULLY in-graph (jit-safe, no host
    round-trip): pairwise product tree (~1 mul/elt) + ONE Fermat
    exponentiation of the 64-byte total (rolled fori_loop, ~2·|mod| tiny
    muls) + down-sweep (~2 muls/elt). Elements MUST be units — zeros give
    garbage. Used by the MSM's batched-affine bucket tree, one call per
    tree level over a whole window group."""
    total = prod_tree_total(cfg, a)
    inv_total = mont_pow_fixed(cfg, total, cfg.inv_exp_bits)
    return inv_apply(cfg, a, inv_total)


def batch_inv(cfg, a):
    """Batched inversion along the batch axes of (L, *batch) via an
    up/down product tree (~3 muls/element, log-depth) + ONE host
    inversion of the 64-byte total product. Zeros map to zeros.
    NOT jit-safe (host round-trip) — inside jit use prod_tree_total +
    inv_apply around a host inversion."""
    batch = a.shape[1:]
    flat = a.reshape(cfg.L, -1)
    one = jnp.asarray(cfg.one_mont, dtype=U32)
    is_z = jnp.all(flat == 0, axis=0)
    safe = jnp.where(is_z[None], one[:, None], flat)

    total = prod_tree_total(cfg, safe)
    tot_int = cfg.from_mont_host(np.asarray(total)[:, None])[0]
    inv_int = pow(tot_int, -1, cfg.mod) if tot_int % cfg.mod else 0
    inv_total = jnp.asarray(cfg.to_mont_host([inv_int]))[:, 0]

    out = inv_apply(cfg, safe, inv_total)
    out = jnp.where(is_z[None], jnp.zeros_like(out), out)
    return out.reshape((cfg.L,) + batch)


def to_mont(cfg, a_raw):
    r2 = jnp.asarray(cfg.r2_limbs, dtype=U32).reshape(
        (cfg.L,) + (1,) * (a_raw.ndim - 1))
    return mont_mul(cfg, a_raw, r2)


def from_mont(cfg, a):
    one_raw = jnp.zeros((cfg.L,) + (1,) * (a.ndim - 1), dtype=U32)
    one_raw = one_raw.at[0].set(1)
    return mont_mul(cfg, a, one_raw)


def select(mask, a, b):
    """mask over batch dims: (batch,) -> limb-broadcast where."""
    return jnp.where(mask[None], a, b)


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)
