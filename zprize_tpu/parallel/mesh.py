"""Multi-chip sharding plans (jax.sharding / shard_map over a named Mesh).

The reference is single-GPU and fully serial (README:59; SURVEY.md §2.3);
scaling here is TPU-native:
  * four-step NTT: rows sharded over the mesh, local column NTTs, twiddle,
    `all_to_all` transpose over ICI, local row NTTs — the sequence-parallel
    analog of the domain dimension;
  * MSM: points sharded (data parallel), per-device grid-Pippenger window
    partials, xyzz-add combine via `all_gather` (EC addition is not a psum,
    so partial points are gathered and tree-folded locally);
  * witness synthesis: embarrassingly data-parallel batched Poseidon.

All tensors are limbs-leading (L, ...); the sharded axis is a batch axis.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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


def mesh_put(mesh, spec, arr):
    """Place a host/process-local array onto `mesh` with `spec`. Works on
    multi-process meshes (each process transfers only its addressable
    shards), unlike passing a process-local jax.Array straight into a
    meshed jit — which raises on non-addressable devices."""
    return jax.device_put(np.asarray(arr), NamedSharding(mesh, spec))


def mesh_replicate(mesh, tree):
    """device_put every array leaf of a pytree fully replicated over the
    mesh. Tables consumed by meshed programs must enter as ARGUMENTS with
    a sharding on that mesh — a closed-over or process-local array spans
    non-addressable devices on a multi-process (DCN) mesh and is rejected
    by jit."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), sh)
        if isinstance(x, jax.Array) else x, tree)


# ---------------------------------------------------------------------------
# four-step NTT (sequence-parallel over the domain)
# ---------------------------------------------------------------------------

class FourStepPlan:
    """n = n1 * n2; input x[i1 + n1*i2] laid out as (L, n1, n2) rows i1
    (sharded on axis 1). Output R[k1][k2] = X[k2 + n2*k1] as (L, n1, n2)
    sharded on k2."""

    def __init__(self, log_n1, log_n2):
        self.log_n1, self.log_n2 = log_n1, log_n2
        self.n1, self.n2 = 1 << log_n1, 1 << log_n2
        from ..ref.field import root_of_unity
        n = self.n1 * self.n2
        omega = root_of_unity(log_n1 + log_n2)
        omega_inv = pow(omega, -1, M)

        def build():
            pows = jpoly.powers(FR, jnp.asarray(FR.scalar_mont(omega)), n)
            ipows = jpoly.powers(
                FR, jnp.asarray(FR.scalar_mont(omega_inv)), n)
            idx = ((np.arange(self.n1, dtype=np.int64)[:, None]
                    * np.arange(self.n2, dtype=np.int64)[None, :]) % n)
            idxd = jnp.asarray(idx.astype(np.int32).reshape(-1))
            tw = jnp.take(pows, idxd, axis=1).reshape(
                FR.L, self.n1, self.n2)
            tw_inv = jnp.take(ipows, idxd, axis=1).reshape(
                FR.L, self.n1, self.n2)
            return (tw, tw_inv)

        self.twiddle, self.twiddle_inv = jntt._host_build(build)
        self.plan1 = jntt.get_plan(log_n1)
        self.plan2 = jntt.get_plan(log_n2)
        self._mesh_cache = {}

    def mesh_tables(self, mesh, axis="shard"):
        """(twiddle, twiddle_inv, plan1, plan2) placed on `mesh`: twiddles
        sharded over n1 (matching the row sharding), plans replicated.
        Cached per (mesh, axis)."""
        key = (mesh, axis)
        if key not in self._mesh_cache:
            self._mesh_cache[key] = (
                mesh_put(mesh, P(None, axis), self.twiddle),
                mesh_put(mesh, P(None, axis), self.twiddle_inv),
                mesh_replicate(mesh, self.plan1),
                mesh_replicate(mesh, self.plan2),
            )
        return self._mesh_cache[key]


def _local_ntt(plan, v, invert=False):
    """Transform over the LAST axis of (L, ..., m)."""
    sp = plan.stage_inv_pows if invert else plan.stage_pows
    out = jntt._core(v, plan.bitrev, sp)
    if invert:
        out = mont.mont_mul(FR, out, plan.n_inv[:, None, None])
    return out


def four_step_ntt(fsp: FourStepPlan, mesh: Mesh, x_rows, axis="shard"):
    """x_rows: (L, n1, n2) device array (x[i1 + n1*i2] at [:, i1, i2]),
    sharded on axis 1. Returns (L, n1, n2) R with R[:, k1, k2] =
    X[k2 + n2*k1], sharded on axis 2."""
    tw, _twi, p1, p2 = fsp.mesh_tables(mesh, axis)

    def step(local_rows, local_tw, p1, p2):
        # 1. length-n2 NTT along each local row (root w^n1 == canonical n2)
        b = _local_ntt(p2, local_rows)
        # 2. twiddle
        c = mont.mont_mul(FR, b, local_tw)
        # 3. transpose across devices: (L, n1/D, n2) -> (L, n1, n2/D)
        t = jax.lax.all_to_all(c, axis, split_axis=2, concat_axis=1,
                               tiled=True)
        # 4. length-n1 NTT along i1 for each local k2 column
        t = jnp.swapaxes(t, 1, 2)                   # (L, n2/D, n1)
        r = _local_ntt(p1, t)
        # local result r[:, k2_local, k1] -> emit as (L, n1, n2/D)
        return jnp.swapaxes(r, 1, 2)

    # check_vma=False: the pallas field kernels (mont.butterfly bodies)
    # build un-annotated ShapeDtypeStruct out_shapes, which jax>=0.9
    # rejects under vma checking (same at every pallas-bearing site here)
    f = jax.shard_map(step, mesh=mesh,
                      in_specs=(P(None, axis), P(None, axis), P(), P()),
                      out_specs=P(None, None, axis), check_vma=False)
    return f(x_rows, tw, p1, p2)


def four_step_intt_natural(fsp: FourStepPlan, mesh: Mesh, evals,
                           axis="shard"):
    """Sharded inverse transform with NATURAL-order input and output:
    evals (L, n) natural -> coeffs (L, n) natural (output flat index equals
    the coefficient index, so downstream MSMs consume it directly)."""
    n = fsp.n1 * fsp.n2
    L = evals.shape[0]
    rows = jnp.swapaxes(evals.reshape(L, fsp.n2, fsp.n1), 1, 2)
    _tw, twi, p1, p2 = fsp.mesh_tables(mesh, axis)

    def step(local_rows, local_tw, p1, p2):
        b = _local_ntt(p2, local_rows, invert=True)
        c = mont.mont_mul(FR, b, local_tw)
        t = jax.lax.all_to_all(c, axis, split_axis=2, concat_axis=1,
                               tiled=True)
        t = jnp.swapaxes(t, 1, 2)
        r = _local_ntt(p1, t, invert=True)
        return jnp.swapaxes(r, 1, 2)

    # check_vma=False for the pallas butterfly kernels (see four_step_ntt)
    f = jax.shard_map(step, mesh=mesh,
                      in_specs=(P(None, axis), P(None, axis), P(), P()),
                      out_specs=P(None, None, axis), check_vma=False)
    out_rows = f(rows, twi, p1, p2)          # out[:, k1, k2] = x[k2 + n2*k1]
    return out_rows.reshape(L, n)


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

def sharded_msm_window_partials(mesh, x_mont, y_mont, digits_w,
                                window_bits, capacity, axis="shard"):
    """Points sharded across devices (axis 1 of (L, n)); each device runs
    the grid-Pippenger window on its shard, partial window points are
    all_gathered and tree-folded. Returns a replicated xyzz point dict."""

    def step(xs, ys, ds):
        part, _over = jmsm.msm_window_grid(xs, ys, ds, window_bits, capacity)
        gathered = {k: jax.lax.all_gather(v, axis, axis=1)
                    for k, v in part.items()}       # (L, D)
        return g1.xyzz_tree_sum(gathered)

    # check_vma=False for the pallas xyzz-add kernels (see four_step_ntt)
    f = jax.shard_map(step, mesh=mesh,
                      in_specs=(P(None, axis), P(None, axis), P(axis)),
                      out_specs=P(), check_vma=False)
    return f(x_mont, y_mont, digits_w)


def sharded_point_sum(mesh, x_mont, y_mont, axis="shard"):
    """TP reduction: per-device xyzz tree-sum of its point shard, then
    all_gather + tree fold."""

    def step(xs, ys):
        pts = g1.xyzz_from_affine(xs, ys)
        total = g1.xyzz_tree_sum(pts)               # (L,)
        gathered = {k: jax.lax.all_gather(v, axis, axis=1)
                    for k, v in total.items()}      # (L, D)
        return g1.xyzz_tree_sum(gathered)

    # check_vma=False for the pallas xyzz-add kernels (see four_step_ntt)
    f = jax.shard_map(step, mesh=mesh,
                      in_specs=(P(None, axis), P(None, axis)),
                      out_specs=P(), check_vma=False)
    return f(x_mont, y_mont)


# ---------------------------------------------------------------------------
# data-parallel witness synthesis
# ---------------------------------------------------------------------------

def sharded_poseidon_hashes(mesh, left, right, axis="shard"):
    """Batched Poseidon over a sharded batch (pure DP), (L, m) inputs."""
    from ..poseidon.vectorized import hash2_batch

    # check_vma=False: the pallas field kernels build un-annotated
    # ShapeDtypeStruct out_shapes, which jax>=0.9 rejects under vma checking
    f = jax.shard_map(hash2_batch, mesh=mesh,
                      in_specs=(P(None, axis), P(None, axis)),
                      out_specs=P(None, axis), check_vma=False)
    return f(left, right)
