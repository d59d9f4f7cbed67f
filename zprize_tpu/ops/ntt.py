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


# threshold above which the single-device four-step decomposition is used:
# two batches of ~sqrt(n)-point sub-NTTs (all ops large and contiguous)
# instead of 22 stages whose early butterflies thrash the TPU layout.
FOUR_STEP_MIN_LOG = 13


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
        self.n_inv = jnp.asarray(
            FR.to_mont_host([pow(n, -1, R_MOD)])[0])
        if log_n < FOUR_STEP_MIN_LOG:
            # direct butterfly tables (large sizes use the four-step path
            # and only need sub-plan tables)
            self.bitrev = jnp.asarray(_bit_reverse_indices(n))
            half = max(n // 2, 1)
            self.pows = jnp.asarray(
                FR.to_mont_host(_host_powers(omega, half)))
            self.inv_pows = jnp.asarray(
                FR.to_mont_host(_host_powers(omega_inv, half)))
        # coset (g = Fr multiplicative generator) distribute-powers tables
        g_inv = pow(FR_GENERATOR, -1, R_MOD)
        self.coset_pows = jnp.asarray(
            FR.to_mont_host(_host_powers(FR_GENERATOR, n)))
        self.coset_inv_pows = jnp.asarray(
            FR.to_mont_host(_host_powers(g_inv, n)))


@lru_cache(maxsize=None)
def get_plan(log_n: int) -> NttPlan:
    return NttPlan(log_n)


@jax.jit
def _core_jit(a, bitrev, pows):
    """Unrolled radix-2 CT butterflies via reshape/slice (TPU-friendly: no
    scatters; the only gather is the initial bit-reversal). Twiddle tables
    arrive as ARGUMENTS — baking them in as closure constants makes the TPU
    compiler embed multi-MB literals and compile-times explode."""
    n = a.shape[0]
    log_n = n.bit_length() - 1
    L = FR.L
    a = jnp.take(a, bitrev, axis=0)
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m >> 1
        stride = n >> s
        w = pows[::stride][:half]                      # (half, L)
        a = a.reshape(n // m, m, L)
        u = a[:, :half]
        v = mont.mont_mul(FR, a[:, half:], w[None])
        a = jnp.concatenate([mont.add(FR, u, v), mont.sub(FR, u, v)], axis=1)
        a = a.reshape(n, L)
    return a


@jax.jit
def _mul_elem_jit(a, b):
    return mont.mont_mul(FR, a, b)


class _FourStepTables:
    def __init__(self, log_n: int):
        from ..ref.field import root_of_unity
        self.log_n1 = log_n // 2
        self.log_n2 = log_n - self.log_n1
        n1, n2 = 1 << self.log_n1, 1 << self.log_n2
        omega = root_of_unity(log_n)
        omega_inv = pow(omega, -1, R_MOD)

        def table(w):
            rows = []
            acc_row = 1
            for i1 in range(n1):
                wi = pow(w, i1, R_MOD)
                row = []
                acc = 1
                for _ in range(n2):
                    row.append(acc)
                    acc = acc * wi % R_MOD
                rows.append(FR.to_mont_host(row))
            return jnp.asarray(np.stack(rows))

        self.tw_fwd = table(omega)        # (n1, n2, L): w^(i1*k2)
        self.tw_inv = table(omega_inv)


_FS_CACHE = {}


def _fs_tables(log_n):
    if log_n not in _FS_CACHE:
        _FS_CACHE[log_n] = _FourStepTables(log_n)
    return _FS_CACHE[log_n]


@jax.jit
def _four_step_jit(a, tw, bitrev2, pows2, n2_inv_or_one,
                   bitrev1, pows1, n1_inv_or_one):
    """Four-step (N)TT. a natural-order (n, L); returns natural order.
    Caller supplies forward or inverse tables (incl. per-sub scale factors,
    so the inverse transform's 1/n folds in automatically)."""
    n = a.shape[0]
    L = a.shape[1]
    n2 = bitrev2.shape[0]
    n1 = bitrev1.shape[0]
    # x[i1 + n1*i2] at [i1][i2]
    xr = jnp.swapaxes(a.reshape(n2, n1, L), 0, 1)
    b = jax.vmap(lambda v: _core_jit(v, bitrev2, pows2))(xr)
    b = mont.mont_mul(FR, b, n2_inv_or_one[None, None])
    c = mont.mont_mul(FR, b, tw)
    d = jnp.swapaxes(c, 0, 1)                      # (n2, n1, L)
    e = jax.vmap(lambda v: _core_jit(v, bitrev1, pows1))(d)
    e = mont.mont_mul(FR, e, n1_inv_or_one[None, None])
    # X[k2 + n2*k1] = e[k2][k1]
    return jnp.swapaxes(e, 0, 1).reshape(n, L)


_ONE_M = None


def _one_mont():
    global _ONE_M
    if _ONE_M is None:
        _ONE_M = np.asarray(FR.one_mont, dtype=np.uint32)
    return jnp.asarray(_ONE_M)


def _transform(plan: NttPlan, a, invert: bool):
    log_n = plan.log_n
    if log_n < FOUR_STEP_MIN_LOG:
        pows = plan.inv_pows if invert else plan.pows
        out = _core_jit(a, plan.bitrev, pows)
        if invert:
            out = _mul_elem_jit(out, plan.n_inv)
        return out
    fs = _fs_tables(log_n)
    p1 = get_plan(fs.log_n1)
    p2 = get_plan(fs.log_n2)
    one = _one_mont()
    if invert:
        return _four_step_jit(a, fs.tw_inv, p2.bitrev, p2.inv_pows, p2.n_inv,
                              p1.bitrev, p1.inv_pows, p1.n_inv)
    return _four_step_jit(a, fs.tw_fwd, p2.bitrev, p2.pows, one,
                          p1.bitrev, p1.pows, one)


def ntt(plan: NttPlan, a):
    """coeffs -> evals (natural order both sides)."""
    return _transform(plan, a, False)


def intt(plan: NttPlan, a):
    return _transform(plan, a, True)


def coset_ntt(plan: NttPlan, a):
    """Evaluate over g*H (ark coset_fft semantics)."""
    return ntt(plan, _mul_elem_jit(a, plan.coset_pows))


def coset_intt(plan: NttPlan, a):
    out = intt(plan, a)
    return _mul_elem_jit(out, plan.coset_inv_pows)
