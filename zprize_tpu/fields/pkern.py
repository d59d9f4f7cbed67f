"""Pallas TPU kernels for Montgomery field arithmetic on limbs-leading
(L, n) uint32 tensors (16-bit limbs).

TPU-native counterpart of the reference's CUDA `mont_t` CIOS kernels
(`lib/PLONK/utils/mont/cuda/ff/mont_t.cuh`): each kernel fuses a complete
field (or curve) operation so every limb intermediate lives in
VMEM/registers — the XLA fallback in `mont.py` materializes ~100
(K, n) intermediates per multiply in HBM and is ~30x slower on chip.

The kernel BODIES are the array-wise algorithms in `limbmath.py` (shared
with the XLA backend — one implementation, two execution contexts),
operating on whole (L, blk) VMEM blocks: O(L) array equations per field
op instead of the round-2/3 O(L^2) unrolled scalar statements, which cost
minutes of Python tracing per shape (see limbmath.py docstring).

Layout contract: arrays are (L, n) u32 with n a multiple of the block
size (callers in `mont.py` pad). Kernels are built per (field, variant)
and cached; each variant also gets ONE cached jax.jit wrapper so call
sites reuse traced jaxprs.

`interpret=True` mode (CPU) is used only by kernel unit tests; production
CPU paths use the vectorized XLA implementation instead.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbmath

MASK = np.uint32(0xFFFF)
LIMB_BITS = 16

# default block width (lanes); (L, BLK) u32 blocks:
#   fr (L=16): 512 KB/buffer at 8192 — fits VMEM with room for temps.
BLK = 8192


class KCfg:
    """Static kernel constants for one field (thin handle around the
    shared LimbParams)."""

    def __init__(self, mod: int, L: int, name: str):
        self.modint = mod
        self.L = L
        self.name = name
        self.P = limbmath.LimbParams(mod, L)

    def consts(self):
        """(3, L) [mod, nprime, one_mont] table — a kernel input. Built
        fresh per call: caching a device array here leaks a tracer when
        the first call happens inside a jit trace."""
        return jnp.asarray(self.P.consts_np)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _pad_to(x, n_pad):
    n = x.shape[-1]
    if n == n_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n_pad - n)]
    return jnp.pad(x, pad)


def _grid_call_impl(kern, n_out_L, blk, interpret, consts, *inputs):
    """Run kern over (L_i, n) inputs blocked along the last axis; `consts`
    is the (3, L) field-constant table, broadcast to every block (pallas
    kernels cannot capture constant arrays). n_out_L: list of output L
    values; all outputs are (L, n)."""
    n = inputs[0].shape[-1]
    b = min(blk, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // b) * b
    padded = [_pad_to(x, n_pad) for x in inputs]
    grid = (n_pad // b,)
    in_specs = [pl.BlockSpec(consts.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec((x.shape[0], b), lambda i: (0, i),
                              memory_space=pltpu.VMEM) for x in padded]
    out_shape = [jax.ShapeDtypeStruct((L, n_pad), jnp.uint32)
                 for L in n_out_L]
    out_specs = [pl.BlockSpec((L, b), lambda i: (0, i),
                              memory_space=pltpu.VMEM) for L in n_out_L]
    outs = pl.pallas_call(
        kern, out_shape=out_shape, grid=grid, in_specs=in_specs,
        out_specs=out_specs, interpret=interpret)(consts, *padded)
    if n_pad != n:
        outs = [o[:, :n] for o in outs]
    return outs


# One cached jax.jit wrapper per (kernel, out-layout, blk, interpret) so
# every call site reuses the traced jaxpr per shape (nested-jit caching).
_JIT_CALLS = {}


def _grid_call(C, kern_key, kern, n_out_L, inputs, blk=BLK,
               interpret=False):
    jkey = (kern_key, tuple(n_out_L), blk, interpret)
    f = _JIT_CALLS.get(jkey)
    if f is None:
        f = jax.jit(partial(_grid_call_impl, kern, tuple(n_out_L), blk,
                            interpret))
        _JIT_CALLS[jkey] = f
    return f(C.consts(), *inputs)


# ---------------------------------------------------------------------------
# public kernel entry points (built per field-config, cached by name)
# ---------------------------------------------------------------------------

_KERNELS = {}


def _get(C, variant, builder):
    key = (C.name, variant)
    if key not in _KERNELS:
        _KERNELS[key] = builder(C)
    return _KERNELS[key]


def mul(C, a, b, interpret=False):
    def build(C):
        def kern(c_ref, a_ref, b_ref, o_ref):
            P = C.P.bind(c_ref[:, :])
            o_ref[:, :] = limbmath.mul(P, a_ref[:, :], b_ref[:, :])
        return kern
    kern = _get(C, "mul", build)
    return _grid_call(C, (C.name, "mul"), kern, [C.L], [a, b],
                      interpret=interpret)[0]


def add(C, a, b, interpret=False):
    def build(C):
        def kern(c_ref, a_ref, b_ref, o_ref):
            P = C.P.bind(c_ref[:, :])
            o_ref[:, :] = limbmath.add(P, a_ref[:, :], b_ref[:, :])
        return kern
    kern = _get(C, "add", build)
    return _grid_call(C, (C.name, "add"), kern, [C.L], [a, b],
                      interpret=interpret)[0]


def sub(C, a, b, interpret=False):
    def build(C):
        def kern(c_ref, a_ref, b_ref, o_ref):
            P = C.P.bind(c_ref[:, :])
            o_ref[:, :] = limbmath.sub(P, a_ref[:, :], b_ref[:, :])
        return kern
    kern = _get(C, "sub", build)
    return _grid_call(C, (C.name, "sub"), kern, [C.L], [a, b],
                      interpret=interpret)[0]


def neg(C, a, interpret=False):
    def build(C):
        def kern(c_ref, a_ref, o_ref):
            P = C.P.bind(c_ref[:, :])
            o_ref[:, :] = limbmath.neg(P, a_ref[:, :])
        return kern
    kern = _get(C, "neg", build)
    return _grid_call(C, (C.name, "neg"), kern, [C.L], [a],
                      interpret=interpret)[0]


def mul_add_sub(C, u, v, w, interpret=False):
    """Fused NTT butterfly: returns (u + v*w, u - v*w)."""
    def build(C):
        def kern(c_ref, u_ref, v_ref, w_ref, p_ref, m_ref):
            P = C.P.bind(c_ref[:, :])
            vw = limbmath.mul(P, v_ref[:, :], w_ref[:, :])
            u = u_ref[:, :]
            p_ref[:, :] = limbmath.add(P, u, vw)
            m_ref[:, :] = limbmath.sub(P, u, vw)
        return kern
    kern = _get(C, "butterfly", build)
    return _grid_call(C, (C.name, "butterfly"), kern, [C.L, C.L],
                      [u, v, w], interpret=interpret)


def mul3(C, a, b, c, interpret=False):
    """a * b * c fused."""
    def build(C):
        def kern(cst_ref, a_ref, b_ref, c_ref, o_ref):
            P = C.P.bind(cst_ref[:, :])
            ab = limbmath.mul(P, a_ref[:, :], b_ref[:, :])
            o_ref[:, :] = limbmath.mul(P, ab, c_ref[:, :])
        return kern
    kern = _get(C, "mul3", build)
    return _grid_call(C, (C.name, "mul3"), kern, [C.L], [a, b, c],
                      interpret=interpret)[0]


# ---------------------------------------------------------------------------
# fused xyzz point kernels (Fq): P = (X, Y, ZZ, ZZZ) stacked as (4L, n)
# ---------------------------------------------------------------------------

_COORDS = ("X", "Y", "ZZ", "ZZZ")


def _split4(a, L):
    return {k: a[i * L:(i + 1) * L] for i, k in enumerate(_COORDS)}


def _cat4(p):
    return jnp.concatenate([p[k] for k in _COORDS], axis=0)


def xyzz_add(C, p, q, interpret=False):
    """p, q: (4L, n) stacked xyzz -> (4L, n)."""
    def build(C):
        def kern(c_ref, p_ref, q_ref, o_ref):
            P = C.P.bind(c_ref[:, :])
            r = limbmath.xyzz_add(P, _split4(p_ref[:, :], C.L),
                                  _split4(q_ref[:, :], C.L))
            o_ref[:, :] = _cat4(r)
        return kern
    kern = _get(C, "xyzz_add", build)
    blk = 1024 if C.L >= 24 else 4096
    return _grid_call(C, (C.name, "xyzz_add"), kern, [4 * C.L], [p, q],
                      blk=blk, interpret=interpret)[0]


def xyzz_add_mixed(C, p, qx, qy, interpret=False):
    """p (4L, n) xyzz + affine q given as (L, n) x & y; (0, 0) = identity."""
    def build(C):
        def kern(c_ref, p_ref, x_ref, y_ref, o_ref):
            P = C.P.bind(c_ref[:, :])
            q = limbmath.affine_lift(P, x_ref[:, :], y_ref[:, :])
            r = limbmath.xyzz_add(P, _split4(p_ref[:, :], C.L), q)
            o_ref[:, :] = _cat4(r)
        return kern
    kern = _get(C, "xyzz_add_mixed", build)
    blk = 1024 if C.L >= 24 else 4096
    return _grid_call(C, (C.name, "xyzz_add_mixed"), kern, [4 * C.L],
                      [p, qx, qy], blk=blk, interpret=interpret)[0]


def xyzz_add_affine2(C, px, py, qx, qy, interpret=False):
    """affine + affine -> xyzz (first level of MSM bucket trees)."""
    def build(C):
        def kern(c_ref, ax_ref, ay_ref, bx_ref, by_ref, o_ref):
            P = C.P.bind(c_ref[:, :])
            p = limbmath.affine_lift(P, ax_ref[:, :], ay_ref[:, :])
            q = limbmath.affine_lift(P, bx_ref[:, :], by_ref[:, :])
            r = limbmath.xyzz_add(P, p, q)
            o_ref[:, :] = _cat4(r)
        return kern
    kern = _get(C, "xyzz_add_affine2", build)
    blk = 1024 if C.L >= 24 else 4096
    return _grid_call(C, (C.name, "xyzz_add_affine2"), kern, [4 * C.L],
                      [px, py, qx, qy], blk=blk, interpret=interpret)[0]
