"""Batched Poseidon on device — computes, for m hash gadgets at once, every
intermediate round state (the per-gadget witness values of the ZPrize gadget,
`zprize_constraints.rs` dataflow) over limbs-leading (L, m) tensors.

State recurrence (keys fused as in the gadget):
    s_0 = [tag + k0, left + k1, right + k2]
    s_{r+1} = M . sbox_r(s_r) + k_{r+1}   (k beyond the last round = 0)
Gadget local variables per hash = [tag, s_0 (3), s_1 (3), ..., s_63 (3)]
and the hash output is s_63[1].
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..params import R_MOD
from ..fields import mont
from ..fields.mont import FR, U32
from .constants import PoseidonConstants

M = R_MOD


@lru_cache(maxsize=None)
def _tables(width=3):
    c = PoseidonConstants.generate(width)
    rounds = c.full_rounds + c.partial_rounds  # 63
    keys = c.round_constants
    pre = np.asarray(FR.to_mont_host(keys[0:width]))          # (L, 3)
    nxt = []
    for r in range(rounds):
        base = (r + 1) * width
        if base >= len(keys):
            nxt.append(FR.to_mont_host([0] * width))
        else:
            nxt.append(FR.to_mont_host(keys[base:base + width]))
    next_keys = np.stack(nxt)                                  # (63, L, 3)
    # mat[l, i, j] = MDS[i][j] limbs
    mat = np.stack([FR.to_mont_host(row) for row in c.mds_matrices.m],
                   axis=1)                                     # (L, 3i, 3j)
    is_full = np.asarray(
        [1] * c.half_full_rounds + [0] * c.partial_rounds
        + [1] * c.half_full_rounds, dtype=np.uint32)
    tag = FR.to_mont_host([c.domain_tag])[:, 0]                # (L,)
    # cache numpy only (jnp arrays created inside a trace would leak tracers)
    return (pre, next_keys, mat, is_full, tag, rounds)


def _pow5(x):
    s2 = mont.mont_sqr(FR, x)
    s4 = mont.mont_sqr(FR, s2)
    return mont.mont_mul(FR, s4, x)


@jax.jit
def poseidon_states(left, right):
    """left/right: (L, m) Montgomery. Returns states (64, L, m, 3):
    states[0] = s_0, states[r+1] = s_{r+1}."""
    pre, next_keys, mat, is_full, tag, rounds = [
        jnp.asarray(x) if isinstance(x, np.ndarray) else x
        for x in _tables()]
    s0 = jnp.stack([
        mont.add(FR, jnp.broadcast_to(tag[:, None], left.shape),
                 jnp.broadcast_to(pre[:, 0][:, None], left.shape)),
        mont.add(FR, left, pre[:, 1][:, None]),
        mont.add(FR, right, pre[:, 2][:, None]),
    ], axis=2)  # (L, m, 3)

    def body(s, xs):
        keys_r, full_r = xs
        sb_all = _pow5(s)
        sb_first = s.at[..., 0].set(sb_all[..., 0])
        sb = jnp.where(full_r != 0, sb_all, sb_first)
        # out[j] = sum_i mat[i][j] * sb[i]  (column-indexed product_mds)
        prods = mont.mont_mul(FR, sb[..., None], mat[:, None])  # (L,m,3i,3j)
        acc = mont.add(FR, mont.add(FR, prods[:, :, 0], prods[:, :, 1]),
                       prods[:, :, 2])
        out = mont.add(FR, acc, keys_r[:, None, :])
        return out, out

    _, states = jax.lax.scan(body, s0, (next_keys, is_full))
    return jnp.concatenate([s0[None], states], axis=0)


def hash2_batch(left, right):
    """(L, m) x (L, m) -> (L, m) Poseidon hashes (device)."""
    return poseidon_states(left, right)[-1][..., 1]
