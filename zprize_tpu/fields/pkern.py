"""Pallas TPU kernels for Montgomery field arithmetic on limbs-leading
(L, n) uint32 tensors (16-bit limbs).

TPU-native counterpart of the reference's CUDA `mont_t` CIOS kernels
(`lib/PLONK/utils/mont/cuda/ff/mont_t.cuh`): each kernel fuses a complete
field (or curve) operation so every limb intermediate lives in
VMEM/registers — the XLA fallback in `mont.py` materializes ~100
(K, n) intermediates per multiply in HBM and is ~30x slower on chip.

Layout contract: arrays are (L, n) u32 with n a multiple of the block
size (callers in `mont.py` pad). Kernels are built per (field, variant)
and cached; the kernel body unrolls all limb loops (L is static).

`interpret=True` mode (CPU) is used only by kernel unit tests; production
CPU paths use the vectorized XLA implementation instead.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = np.uint32(0xFFFF)
LIMB_BITS = 16

# default block width (lanes); (L, BLK) u32 blocks:
#   fr (L=16): 512 KB/buffer at 8192 — fits VMEM with room for temps.
BLK = 8192


# ---------------------------------------------------------------------------
# in-kernel cores: operate on Python lists of (blk,) u32 vectors
# ---------------------------------------------------------------------------

def _zeros_like(v):
    return jnp.zeros_like(v)


def mul_core(C, a, b):
    """CIOS Montgomery product of limb lists a, b -> limb list (reduced)."""
    L = C.L
    t = [_zeros_like(a[0]) for _ in range(L + 2)]
    for i in range(L):
        carry = _zeros_like(a[0])
        for j in range(L):
            p = a[i] * b[j]
            s = t[j] + (p & MASK) + carry
            t[j] = s & MASK
            carry = (s >> LIMB_BITS) + (p >> LIMB_BITS)
        t[L] = t[L] + carry
        m = (t[0] * C.np0) & MASK
        carry = _zeros_like(a[0])
        for j in range(L):
            p = m * C.mod[j]
            s = t[j] + (p & MASK) + carry
            t[j] = s & MASK
            carry = (s >> LIMB_BITS) + (p >> LIMB_BITS)
        s = t[L] + carry
        t[L] = s & MASK
        t[L + 1] = t[L + 1] + (s >> LIMB_BITS)
        t = t[1:] + [_zeros_like(a[0])]
    return cond_sub_core(C, t[:L], t[L])


def cond_sub_core(C, t, extra):
    """t (L limbs, each < 2^16) + extra carry-limb -> reduced < mod."""
    L = C.L
    ge = extra > 0
    eq = None
    gt = None
    for j in range(L - 1, -1, -1):
        if eq is None:
            gt = t[j] > C.mod[j]
            eq = t[j] == C.mod[j]
        else:
            gt = gt | (eq & (t[j] > C.mod[j]))
            eq = eq & (t[j] == C.mod[j])
    ge = ge | gt | eq
    out = []
    borrow = _zeros_like(t[0])
    for j in range(L):
        d = t[j] - C.mod[j] - borrow
        borrow = (d >> LIMB_BITS) & np.uint32(1)
        out.append(jnp.where(ge, d & MASK, t[j]))
    return out


def add_core(C, a, b):
    L = C.L
    t = []
    carry = _zeros_like(a[0])
    for j in range(L):
        s = a[j] + b[j] + carry
        t.append(s & MASK)
        carry = s >> LIMB_BITS
    return cond_sub_core(C, t, carry)


def sub_raw_core(C, a, b):
    """a - b limbwise; returns (diff limbs masked, final_borrow (0/1))."""
    L = C.L
    out = []
    borrow = _zeros_like(a[0])
    for j in range(L):
        d = a[j] - b[j] - borrow
        borrow = (d >> LIMB_BITS) & np.uint32(1)
        out.append(d & MASK)
    return out, borrow


def sub_core(C, a, b):
    """(a - b) mod p."""
    L = C.L
    d, borrow = sub_raw_core(C, a, b)
    t = []
    carry = _zeros_like(a[0])
    und = borrow != 0
    for j in range(L):
        s = d[j] + C.mod[j] + carry
        t.append(jnp.where(und, s & MASK, d[j]))
        carry = s >> LIMB_BITS
    return t


def neg_core(C, a):
    is_z = None
    for j in range(C.L):
        z = a[j] == 0
        is_z = z if is_z is None else (is_z & z)
    mod_limbs = [jnp.broadcast_to(m, a[0].shape) for m in C.mod]
    d, _ = sub_raw_core(C, mod_limbs, a)
    return [jnp.where(is_z, a[j], d[j]) for j in range(C.L)]


def is_zero_core(a):
    z = None
    for x in a:
        t = x == 0
        z = t if z is None else (z & t)
    return z


def dbl_core(C, a):
    return add_core(C, a, a)


def sqr_core(C, a):
    return mul_core(C, a, a)


class KCfg:
    """Static kernel constants for one field."""

    def __init__(self, mod: int, L: int, name: str):
        self.modint = mod
        self.L = L
        self.name = name
        self.mod = tuple(np.uint32((mod >> (16 * i)) & 0xFFFF)
                         for i in range(L))
        npr = (-pow(mod, -1, 1 << 16)) % (1 << 16)
        self.np0 = np.uint32(npr)
        rr = pow(2, 2 * 16 * L, mod)
        one_m = pow(2, 16 * L, mod)
        self.one_mont = tuple(np.uint32((one_m >> (16 * i)) & 0xFFFF)
                              for i in range(L))


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _pad_to(x, n_pad):
    n = x.shape[-1]
    if n == n_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n_pad - n)]
    return jnp.pad(x, pad)


def _grid_call_impl(kern, n_out_L, blk, interpret, *inputs):
    """Run kern over (L_i, n) inputs blocked along the last axis.
    n_out_L: list of output L values; all outputs are (L, n)."""
    n = inputs[0].shape[-1]
    b = min(blk, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // b) * b
    padded = [_pad_to(x, n_pad) for x in inputs]
    grid = (n_pad // b,)
    in_specs = [pl.BlockSpec((x.shape[0], b), lambda i: (0, i),
                             memory_space=pltpu.VMEM) for x in padded]
    out_shape = [jax.ShapeDtypeStruct((L, n_pad), jnp.uint32)
                 for L in n_out_L]
    out_specs = [pl.BlockSpec((L, b), lambda i: (0, i),
                              memory_space=pltpu.VMEM) for L in n_out_L]
    outs = pl.pallas_call(
        kern, out_shape=out_shape, grid=grid, in_specs=in_specs,
        out_specs=out_specs, interpret=interpret)(*padded)
    if n_pad != n:
        outs = [o[:, :n] for o in outs]
    return outs


# One cached jax.jit wrapper per (kernel, out-layout, blk, interpret): a
# kernel body unrolls L^2-scale limb statements, so tracing it is ~10^4
# jaxpr eqns — without the nested-jit cache EVERY call site (hundreds per
# prover round program: each tree-reduce level, each field op in a widget
# chain) re-traced the body, which is where the ~200 s/shape Python
# lowering of round 3 went. Nested jit caches by (fn identity, avals):
# each unique shape traces once per process.
_JIT_CALLS = {}


def _grid_call(kern_key, kern, n_out_L, inputs, blk=BLK, interpret=False):
    jkey = (kern_key, tuple(n_out_L), blk, interpret)
    f = _JIT_CALLS.get(jkey)
    if f is None:
        f = jax.jit(partial(_grid_call_impl, kern, tuple(n_out_L), blk,
                            interpret))
        _JIT_CALLS[jkey] = f
    return f(*inputs)


def _rd(ref):
    return [ref[i, :] for i in range(ref.shape[0])]


def _wr(ref, limbs):
    for i, v in enumerate(limbs):
        ref[i, :] = v


# ---------------------------------------------------------------------------
# public kernel entry points (built per field-config, cached by name)
# ---------------------------------------------------------------------------

_KERNELS = {}


def _get(C, variant, builder):
    key = (C.name, variant)
    if key not in _KERNELS:
        _KERNELS[key] = builder(C)
    return _KERNELS[key]


def _mk_binop(core):
    def build(C):
        def kern(a_ref, b_ref, o_ref):
            _wr(o_ref, core(C, _rd(a_ref), _rd(b_ref)))
        return kern
    return build


def _mk_unop(core):
    def build(C):
        def kern(a_ref, o_ref):
            _wr(o_ref, core(C, _rd(a_ref)))
        return kern
    return build


def mul(C, a, b, interpret=False):
    kern = _get(C, "mul", _mk_binop(mul_core))
    return _grid_call((C.name, "mul"), kern, [C.L], [a, b],
                      interpret=interpret)[0]


def add(C, a, b, interpret=False):
    kern = _get(C, "add", _mk_binop(add_core))
    return _grid_call((C.name, "add"), kern, [C.L], [a, b],
                      interpret=interpret)[0]


def sub(C, a, b, interpret=False):
    kern = _get(C, "sub", _mk_binop(sub_core))
    return _grid_call((C.name, "sub"), kern, [C.L], [a, b],
                      interpret=interpret)[0]


def neg(C, a, interpret=False):
    kern = _get(C, "neg", _mk_unop(neg_core))
    return _grid_call((C.name, "neg"), kern, [C.L], [a],
                      interpret=interpret)[0]


def mul_add_sub(C, u, v, w, interpret=False):
    """Fused NTT butterfly: returns (u + v*w, u - v*w)."""
    def build(C):
        def kern(u_ref, v_ref, w_ref, p_ref, m_ref):
            vw = mul_core(C, _rd(v_ref), _rd(w_ref))
            u = _rd(u_ref)
            _wr(p_ref, add_core(C, u, vw))
            _wr(m_ref, sub_core(C, u, vw))
        return kern
    kern = _get(C, "butterfly", build)
    return _grid_call((C.name, "butterfly"), kern, [C.L, C.L], [u, v, w],
                      interpret=interpret)


def mul3(C, a, b, c, interpret=False):
    """a * b * c fused."""
    def build(C):
        def kern(a_ref, b_ref, c_ref, o_ref):
            ab = mul_core(C, _rd(a_ref), _rd(b_ref))
            _wr(o_ref, mul_core(C, ab, _rd(c_ref)))
        return kern
    kern = _get(C, "mul3", build)
    return _grid_call((C.name, "mul3"), kern, [C.L], [a, b, c],
                      interpret=interpret)[0]


# ---------------------------------------------------------------------------
# fused xyzz point kernels (Fq): P = (X, Y, ZZ, ZZZ) stacked as (4L, n)
# ---------------------------------------------------------------------------

def _xyzz_add_core(C, p, q):
    """Unified xyzz add with identity/equal/inverse handling (xyzz_t.hpp
    semantics). p, q: 4 limb-lists each."""
    X1, Y1, ZZ1, ZZZ1 = p
    X2, Y2, ZZ2, ZZZ2 = q
    U1 = mul_core(C, X1, ZZ2)
    U2 = mul_core(C, X2, ZZ1)
    S1 = mul_core(C, Y1, ZZZ2)
    S2 = mul_core(C, Y2, ZZZ1)
    P = sub_core(C, U2, U1)
    R = sub_core(C, S2, S1)
    PP = sqr_core(C, P)
    PPP = mul_core(C, P, PP)
    Q = mul_core(C, U1, PP)
    R2 = sqr_core(C, R)
    X3 = sub_core(C, sub_core(C, R2, PPP), dbl_core(C, Q))
    Y3 = sub_core(C, mul_core(C, R, sub_core(C, Q, X3)),
                  mul_core(C, S1, PPP))
    ZZ3 = mul_core(C, mul_core(C, ZZ1, ZZ2), PP)
    ZZZ3 = mul_core(C, mul_core(C, ZZZ1, ZZZ2), PPP)

    # doubling path (dbl-2008-s-1, a=0)
    U = dbl_core(C, Y1)
    V = sqr_core(C, U)
    W = mul_core(C, U, V)
    S = mul_core(C, X1, V)
    XX = sqr_core(C, X1)
    Mv = add_core(C, dbl_core(C, XX), XX)
    Xd = sub_core(C, sqr_core(C, Mv), dbl_core(C, S))
    Yd = sub_core(C, mul_core(C, Mv, sub_core(C, S, Xd)),
                  mul_core(C, W, Y1))
    ZZd = mul_core(C, V, ZZ1)
    ZZZd = mul_core(C, W, ZZZ1)

    p_inf = is_zero_core(ZZ1)
    q_inf = is_zero_core(ZZ2)
    same_x = is_zero_core(P)
    same_y = is_zero_core(R)
    use_dbl = same_x & same_y
    inf_out = same_x & (~same_y)

    def pick(add_v, dbl_v, pv, qv, zero_on_inf):
        out = []
        for j in range(C.L):
            v = jnp.where(use_dbl, dbl_v[j], add_v[j])
            if zero_on_inf:
                v = jnp.where(inf_out, jnp.zeros_like(v), v)
            v = jnp.where(p_inf, qv[j], v)
            v = jnp.where(q_inf, pv[j], v)
            out.append(v)
        return out

    return (pick(X3, Xd, X1, X2, False), pick(Y3, Yd, Y1, Y2, False),
            pick(ZZ3, ZZd, ZZ1, ZZ2, True), pick(ZZZ3, ZZZd, ZZZ1, ZZZ2, True))


def _split4(limbs, L):
    return [limbs[i * L:(i + 1) * L] for i in range(4)]


def xyzz_add(C, p, q, interpret=False):
    """p, q: (4L, n) stacked xyzz -> (4L, n)."""
    def build(C):
        def kern(p_ref, q_ref, o_ref):
            pp = _split4(_rd(p_ref), C.L)
            qq = _split4(_rd(q_ref), C.L)
            r = _xyzz_add_core(C, pp, qq)
            _wr(o_ref, [v for coord in r for v in coord])
        return kern
    kern = _get(C, "xyzz_add", build)
    blk = 2048 if C.L >= 24 else 4096
    return _grid_call((C.name, "xyzz_add"), kern, [4 * C.L], [p, q],
                      blk=blk, interpret=interpret)[0]


def _affine_lift_core(C, x, y):
    """affine (x, y) -> xyzz limb lists; (0,0) encodes identity."""
    inf = is_zero_core(x) & is_zero_core(y)
    zero = jnp.zeros_like(x[0])
    z = [jnp.where(inf, zero, jnp.full_like(x[0], C.one_mont[j]))
         for j in range(C.L)]
    return (x, y, z, list(z))


def xyzz_add_mixed(C, p, qx, qy, interpret=False):
    """p (4L, n) xyzz + affine q given as (L, n) x & y; (0, 0) = identity."""
    def build(C):
        def kern(p_ref, x_ref, y_ref, o_ref):
            pp = _split4(_rd(p_ref), C.L)
            qq = _affine_lift_core(C, _rd(x_ref), _rd(y_ref))
            r = _xyzz_add_core(C, pp, qq)
            _wr(o_ref, [v for coord in r for v in coord])
        return kern
    kern = _get(C, "xyzz_add_mixed", build)
    blk = 2048 if C.L >= 24 else 4096
    return _grid_call((C.name, "xyzz_add_mixed"), kern, [4 * C.L],
                      [p, qx, qy], blk=blk, interpret=interpret)[0]


def xyzz_add_affine2(C, px, py, qx, qy, interpret=False):
    """affine + affine -> xyzz (first level of MSM bucket trees)."""
    def build(C):
        def kern(ax_ref, ay_ref, bx_ref, by_ref, o_ref):
            pp = _affine_lift_core(C, _rd(ax_ref), _rd(ay_ref))
            qq = _affine_lift_core(C, _rd(bx_ref), _rd(by_ref))
            r = _xyzz_add_core(C, pp, qq)
            _wr(o_ref, [v for coord in r for v in coord])
        return kern
    kern = _get(C, "xyzz_add_affine2", build)
    blk = 2048 if C.L >= 24 else 4096
    return _grid_call((C.name, "xyzz_add_affine2"), kern, [4 * C.L],
                      [px, py, qx, qy], blk=blk, interpret=interpret)[0]
