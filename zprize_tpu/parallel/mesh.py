"""Multi-chip sharding plans (jax.sharding / shard_map over a named Mesh).

The reference is single-GPU and fully serial (README:59; SURVEY.md §2.3);
scaling here is TPU-native:
  * four-step NTT: rows sharded over the mesh, local column NTTs, twiddle,
    `all_to_all` transpose over ICI, local row NTTs — the sequence-parallel
    analog of the domain dimension;
  * MSM: points sharded (data parallel), per-device scan-Pippenger window
    partials, xyzz-add combine via `all_gather` (EC addition is not a psum,
    so partial points are gathered and folded locally);
  * witness synthesis: embarrassingly data-parallel batched Poseidon.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..params import R_MOD
from ..fields import mont
from ..fields.mont import FR, U32
from ..ops import ntt as jntt
from ..ops import poly as jpoly
from ..curve import g1
from ..ops import msm as jmsm

M = R_MOD


def make_mesh(n_devices=None, axis="shard"):
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devs), (axis,))


# ---------------------------------------------------------------------------
# four-step NTT
# ---------------------------------------------------------------------------

class FourStepPlan:
    """n = n1 * n2; input x[i1 + n1*i2] laid out as rows i1 (sharded).
    Output R[k1][k2] = X[k2 + n2*k1] returned as a (n1, n2, L) array
    sharded on k... (row-major by k1)."""

    def __init__(self, log_n1, log_n2):
        from ..ref.field import root_of_unity
        self.log_n1, self.log_n2 = log_n1, log_n2
        self.n1, self.n2 = 1 << log_n1, 1 << log_n2
        n = self.n1 * self.n2
        omega = root_of_unity(log_n1 + log_n2)
        omega_inv = pow(omega, -1, M)

        def table(w):
            rows = []
            for i1 in range(self.n1):
                wi = pow(w, i1, M)
                acc = 1
                row = []
                for _ in range(self.n2):
                    row.append(acc)
                    acc = acc * wi % M
                rows.append(FR.to_mont_host(row))
            return jnp.asarray(np.stack(rows))

        self.twiddle = table(omega)          # w^(i1*k2): (n1, n2, L)
        self.twiddle_inv = table(omega_inv)
        self.plan1 = jntt.get_plan(log_n1)
        self.plan2 = jntt.get_plan(log_n2)


def four_step_ntt(fsp: FourStepPlan, mesh: Mesh, x_rows, axis="shard"):
    """x_rows: (n1, n2, L) device array (x[i1 + n1*i2] at [i1, i2]),
    sharded on axis 0. Returns (n1, n2, L) R with R[k1, k2] = X[k2 + n2*k1],
    sharded on axis 0."""
    D = mesh.shape[axis]
    tw = fsp.twiddle

    def step(local_rows, local_tw):
        # 1. length-n2 NTT along each local row (root w^n1 == canonical n2)
        b = jax.vmap(lambda v: jntt.ntt(fsp.plan2, v))(local_rows)
        # 2. twiddle
        c = mont.mont_mul(FR, b, local_tw)
        # 3. transpose across devices: (n1/D, n2, L) -> (n1, n2/D, L)
        t = jax.lax.all_to_all(c, axis, split_axis=1, concat_axis=0,
                               tiled=True)
        # 4. length-n1 NTT along i1 for each local k2 column
        t = jnp.swapaxes(t, 0, 1)                   # (n2/D, n1, L)
        r = jax.vmap(lambda v: jntt.ntt(fsp.plan1, v))(t)
        # local result r[k2_local, k1] -> emit as (n1, n2/D, L) rows k1
        return jnp.swapaxes(r, 0, 1)                # (n1, n2/D, L)

    f = jax.shard_map(step, mesh=mesh,
                      in_specs=(P(axis), P(axis)),
                      out_specs=P(None, axis))
    return f(x_rows, tw)


def four_step_intt_natural(fsp: FourStepPlan, mesh: Mesh, evals, axis="shard"):
    """Sharded inverse transform with NATURAL-order input and output:
    evals (n, L) natural -> coeffs (n, L) natural (output flat index equals
    the coefficient index, so downstream MSMs consume it directly).

    Internally: reshape to the (i1, i2) row layout, run the four-step with
    inverse twiddles and inverse sub-NTTs (the two 1/n_i factors compose to
    the 1/n scale), transpose back."""
    n = fsp.n1 * fsp.n2
    L = evals.shape[-1]
    rows = jnp.swapaxes(evals.reshape(fsp.n2, fsp.n1, L), 0, 1)

    def _sub_intt(plan, v):
        out = jntt._core_jit(v, plan.bitrev, plan.inv_pows)
        return mont.mont_mul(FR, out, plan.n_inv)

    def step(local_rows, local_tw):
        b = jax.vmap(lambda v: _sub_intt(fsp.plan2, v))(local_rows)
        c = mont.mont_mul(FR, b, local_tw)
        t = jax.lax.all_to_all(c, axis, split_axis=1, concat_axis=0,
                               tiled=True)
        t = jnp.swapaxes(t, 0, 1)
        r = jax.vmap(lambda v: _sub_intt(fsp.plan1, v))(t)
        return jnp.swapaxes(r, 0, 1)

    f = jax.shard_map(step, mesh=mesh,
                      in_specs=(P(axis), P(axis)),
                      out_specs=P(None, axis))
    out_rows = f(rows, fsp.twiddle_inv)          # R[k1, k2] = X[k2 + n2 k1]
    return out_rows.reshape(n, L)


def reference_four_step_check(fsp: FourStepPlan, coeffs):
    """Host-side oracle: natural-order NTT -> R[k1][k2] matrix."""
    from ..ref.domain import Domain
    n = fsp.n1 * fsp.n2
    d = Domain(n)
    # x[i1 + n1*i2] = rows[i1][i2]
    flat = [0] * n
    for i1 in range(fsp.n1):
        for i2 in range(fsp.n2):
            flat[i1 + fsp.n1 * i2] = coeffs[i1][i2]
    X = d.fft(flat)
    R = [[X[k2 + fsp.n2 * k1] for k2 in range(fsp.n2)]
         for k1 in range(fsp.n1)]
    return R


# ---------------------------------------------------------------------------
# sharded MSM
# ---------------------------------------------------------------------------

def sharded_msm_window_partials(mesh, x_mont, y_mont, inf_mask, digits_w,
                                window_bits, axis="shard"):
    """Points sharded across devices; returns the window sum as a replicated
    single xyzz point (each device folds the all-gathered partials)."""

    def step(xs, ys, infs, ds):
        part = jmsm.msm_window(xs, ys, infs, ds, window_bits)
        gathered = {k: jax.lax.all_gather(v, axis) for k, v in part.items()}
        D = gathered["X"].shape[0]
        acc = {k: v[0] for k, v in gathered.items()}
        for i in range(1, D):
            acc = g1.xyzz_add(acc, {k: v[i] for k, v in gathered.items()})
        return acc

    f = jax.shard_map(step, mesh=mesh,
                      in_specs=(P(axis), P(axis), P(axis), P(axis)),
                      out_specs=P(), check_vma=False)
    return f(x_mont, y_mont, inf_mask, digits_w)


def sharded_point_sum(mesh, x_mont, y_mont, inf_mask, axis="shard"):
    """Light TP reduction used by the dryrun: per-device xyzz sum of its
    point shard (lax.scan), then all_gather + fold. One scan body keeps the
    compiled graph small."""

    def step(xs, ys, infs):
        pts = g1.xyzz_from_affine(xs, ys, infs)

        def body(carry, p):
            return g1.xyzz_add(carry, p), None

        zero = {k: jnp.zeros_like(v[0]) for k, v in pts.items()}
        total, _ = jax.lax.scan(body, zero, pts)
        gathered = {k: jax.lax.all_gather(v, axis) for k, v in total.items()}

        def body2(carry, p):
            return g1.xyzz_add(carry, p), None

        total_all, _ = jax.lax.scan(body2, zero, gathered)
        return total_all

    f = jax.shard_map(step, mesh=mesh,
                      in_specs=(P(axis), P(axis), P(axis)),
                      out_specs=P(), check_vma=False)
    return f(x_mont, y_mont, inf_mask)


# ---------------------------------------------------------------------------
# data-parallel witness synthesis
# ---------------------------------------------------------------------------

def sharded_poseidon_hashes(mesh, left, right, axis="shard"):
    """Batched Poseidon over a sharded batch (pure DP)."""
    from ..poseidon.vectorized import hash2_batch

    f = jax.shard_map(hash2_batch, mesh=mesh,
                      in_specs=(P(axis), P(axis)), out_specs=P(axis))
    return f(left, right)
