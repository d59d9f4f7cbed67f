"""NTT / INTT / coset variants over Fr on device.

TPU-native replacement for the sppark-derived CUDA NTT
(`lib/PLONK/utils/zkp/cuda/ntt/*`): a radix-2 Cooley-Tukey expressed as
array-level butterflies (reshape + slice) so each stage is one fully
vectorized Montgomery multiply + add/sub over n/2 lanes. Twiddle tables are
device-resident in Montgomery form (north-star requirement), generated once
per domain.

Values are (n, L) uint32 Montgomery-form tensors throughout; the transform is
linear so Montgomery form is preserved.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..params import R_MOD, FR_GENERATOR
from ..fields import mont
from ..fields.mont import FR, U32


def _bit_reverse_indices(n):
    log_n = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def _host_powers(base: int, count: int):
    out = np.empty(count, dtype=object)
    acc = 1
    for i in range(count):
        out[i] = acc
        acc = acc * base % R_MOD
    return [int(x) for x in out]


class NttPlan:
    """Per-domain twiddles + butterfly index tables (counterpart of sppark
    `params_zkp_cuda` twiddle generation, `zksnark_ntt.cu:16-54`).

    The butterfly schedule is precomputed as (log_n, n/2) index arrays so the
    transform runs as a `fori_loop` with a single compiled stage body."""

    def __init__(self, log_n: int):
        from ..ref.field import root_of_unity
        self.log_n = log_n
        self.n = 1 << log_n
        n = self.n
        omega = root_of_unity(log_n)
        omega_inv = pow(omega, -1, R_MOD)
        self.omega = omega
        self.bitrev = jnp.asarray(_bit_reverse_indices(n))
        half = max(n // 2, 1)
        self.pows = jnp.asarray(FR.to_mont_host(_host_powers(omega, half)))
        self.inv_pows = jnp.asarray(
            FR.to_mont_host(_host_powers(omega_inv, half)))
        self.n_inv = jnp.asarray(
            FR.to_mont_host([pow(n, -1, R_MOD)])[0])
        # coset (g = Fr multiplicative generator) distribute-powers tables
        g_inv = pow(FR_GENERATOR, -1, R_MOD)
        self.coset_pows = jnp.asarray(
            FR.to_mont_host(_host_powers(FR_GENERATOR, n)))
        self.coset_inv_pows = jnp.asarray(
            FR.to_mont_host(_host_powers(g_inv, n)))

        # butterfly schedule: stage s in [1, log_n]; block size m = 2^s
        u_idx = np.zeros((log_n, half), dtype=np.uint32)
        v_idx = np.zeros((log_n, half), dtype=np.uint32)
        w_idx = np.zeros((log_n, half), dtype=np.uint32)
        k = np.arange(half, dtype=np.uint32)
        for s in range(1, log_n + 1):
            m = 1 << s
            hm = m >> 1
            block = k // hm
            pos = k % hm
            u_idx[s - 1] = block * m + pos
            v_idx[s - 1] = block * m + hm + pos
            w_idx[s - 1] = pos * (n >> s)
        self.u_idx = jnp.asarray(u_idx)
        self.v_idx = jnp.asarray(v_idx)
        self.w_idx = jnp.asarray(w_idx)


@lru_cache(maxsize=None)
def get_plan(log_n: int) -> NttPlan:
    return NttPlan(log_n)


def _core(plan: NttPlan, a, pows):
    a = jnp.take(a, plan.bitrev, axis=0)

    def stage(s, a):
        ui = plan.u_idx[s]
        vi = plan.v_idx[s]
        w = jnp.take(pows, plan.w_idx[s], axis=0)
        u = jnp.take(a, ui, axis=0)
        v = mont.mont_mul(FR, jnp.take(a, vi, axis=0), w)
        a = a.at[ui].set(mont.add(FR, u, v))
        a = a.at[vi].set(mont.sub(FR, u, v))
        return a

    return jax.lax.fori_loop(0, plan.log_n, stage, a)


def ntt(plan: NttPlan, a):
    """coeffs -> evals (natural order both sides)."""
    return _core(plan, a, plan.pows)


def intt(plan: NttPlan, a):
    out = _core(plan, a, plan.inv_pows)
    return mont.mont_mul(FR, out, plan.n_inv)


def coset_ntt(plan: NttPlan, a):
    """Evaluate over g*H (ark coset_fft semantics)."""
    return ntt(plan, mont.mont_mul(FR, a, plan.coset_pows))


def coset_intt(plan: NttPlan, a):
    out = intt(plan, a)
    return mont.mont_mul(FR, out, plan.coset_inv_pows)
