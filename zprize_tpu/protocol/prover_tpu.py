"""TPU prover — the 5-round PLONK pipeline compiled into a handful of fused
XLA/Pallas programs over limbs-leading (L, n) tensors, mirroring
`ref/prover.py` (the executable spec) round-for-round and
transcript-byte-for-byte. Counterpart of the reference's GPU `prove()`
(`lib/PLONK/src/gen_proof.cuh:10-489`).

Round-2 architecture:
  * each prover round runs as one (or two) jitted programs taking the
    prover key, domain tables (pytrees) and challenge limbs as ARGUMENTS —
    per-proof host dispatch is ~20 program launches, not hundreds of eager
    ops (the tunneled runtime costs ~10 ms per dispatch);
  * the 8n quotient domain is processed as 8 independent n-sized coset
    sub-problems (see `ops/ntt.py SubcosetTables`): the prover NEVER runs
    an 8n transform and never stores (L, 8n) selector tables — the
    TPU-native replacement for the reference's 8n selector streaming
    (`gen_proof.cuh:277-317`, `quotient.cu:142-376`);
  * MSM commitments run the grid-Pippenger window scan + an on-device
    window fold; the host pulls one xyzz point (~400 B) per commitment;
  * host keeps only O(1) work: Fiat-Shamir, two 64-byte field inversions
    (grand-product tree totals), and commitment affine conversion.
"""

import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..params import R_MOD, K1, K2, K3, JUBJUB_A, JUBJUB_D
from ..fields import mont
from ..fields.mont import FR, FQ, U32
from ..fields.frvec import FV
from ..fields.limb import ints_to_limbs, limbs_to_ints
from ..ops import ntt as jntt
from ..ops import poly as jpoly
from ..ops import msm as jmsm
from ..curve import g1 as jg1
from ..protocol.proof import Proof, Evaluations
from ..protocol import widgets_jax as W
from ..ref.prover import combine_split
from .. import aot

M = R_MOD

SELECTOR_NAMES = [
    "q_m", "q_l", "q_r", "q_o", "q_4", "q_c", "q_hl", "q_hr", "q_h4",
    "q_arith", "q_range", "q_logic", "q_lookup", "q_fixed_group_add",
    "q_variable_group_add",
]


def _to_dev(ints):
    """ints -> device (L, n) Montgomery limbs; large lists convert on
    device."""
    if len(ints) <= 4096:
        return jnp.asarray(FR.to_mont_host(ints))
    raw = jnp.asarray(ints_to_limbs([x % M for x in ints], FR.L).T.copy())
    return mont.to_mont(FR, raw)


def _from_dev(arr):
    """device (L, n) Montgomery limbs -> list of ints."""
    return FR.from_mont_host(np.asarray(mont.from_mont(FR, arr)))


def _scal(x: int):
    """int -> (L,) Montgomery limbs on device."""
    return jnp.asarray(FR.scalar_mont(x))


class ProverConfig:
    """msm_backend: 'device' runs the grid Pippenger on the accelerator
    (production); 'host' pulls scalars and uses the Python oracle MSM —
    kept for differential tests of everything-but-MSM.

    mesh: optional `jax.sharding.Mesh`. When set, prove_tpu places the
    prover key, witness and SRS tables with their evaluation-domain axis
    sharded over `mesh_axis` and runs the SAME fused round programs —
    XLA's SPMD partitioner inserts the ICI collectives (all_to_all for the
    NTT transposes, all_gather/psum-style combines for reductions). This is
    the multi-chip prover; the reference is single-GPU (README:59), so
    scaling over a mesh is this framework's TPU-native addition."""

    def __init__(self, msm_backend="device", msm_window_bits=None,
                 mesh=None, mesh_axis="shard", device=None):
        self.msm_backend = msm_backend
        self.msm_window_bits = msm_window_bits
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # explicit single-device placement (whole-proof DP: one proof per
        # device, see protocol/batch.py); mutually exclusive with `mesh`
        self.device = device

    def shard_last(self, tree):
        """device_put every (L, ..., m) leaf with the LAST axis sharded
        over the mesh (replicated if not divisible). No-op without a
        mesh."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        ndev = self.mesh.devices.size

        def place(x):
            if not hasattr(x, "shape"):
                return x
            axes = [None] * x.ndim
            # shard the trailing (domain) axis of (L, ..., m) tables;
            # rank-1 leaves ((L,) scalars, index vectors) are replicated
            if x.ndim >= 2 and x.shape[-1] % ndev == 0:
                axes[-1] = self.mesh_axis
            return jax.device_put(
                x, NamedSharding(self.mesh, P(*axes)))

        return jax.tree.map(place, tree)


class DevSRS:
    def __init__(self, srs, device=True):
        self.ref = srs
        self.size = len(srs.powers_of_g)
        self.points = (jg1.affine_points_to_device(srs.powers_of_g)
                       if device else None)

    def replicate(self, device):
        """Copy with device arrays placed on `device` (whole-proof DP).
        Field list lives here so new attributes propagate automatically."""
        s = DevSRS.__new__(DevSRS)
        s.__dict__.update(self.__dict__)
        s.points = jax.tree.map(
            lambda x: jax.device_put(x, device) if isinstance(x, jax.Array)
            else x, self.points)
        return s


class DevProverKey:
    """Device-resident prover key: selector/sigma COEFFICIENT polys plus the
    sigma n-domain evals. The reference keeps every selector additionally as
    an 8n coset-eval table and streams those from 62 GB of host RAM
    (`load.cu:58-307`, `gen_proof.cuh:277-317`); here the quotient round
    recomputes each sub-coset's evals on the fly from coefficient form
    (8 shifted n-NTTs inside `_quotient_jit`'s scan) — at n=2^22 that trades
    ~38 GiB of resident (L, 8, n) tables for 19 extra n-NTTs per sub-coset
    pass, which is the right trade when HBM is 16 GB and the host link is a
    tunnel. Registered as a pytree (jit argument)."""

    lookup_degenerate = False

    @classmethod
    def from_ref(cls, pk):
        """Build from the executable-spec ProverKey (int lists)."""
        self = cls()
        self.n = pk.n
        self.log_n = pk.n.bit_length() - 1
        self.sel_poly = {k: _to_dev(v) for k, v in pk.selector_polys.items()}
        self.sigma_poly = [_to_dev(v) for v in pk.sigma_polys]
        self.sigma_evals_n = [_to_dev(v) for v in pk.sigma_evals_n]
        self.table_cols = [_to_dev(c) for c in pk.table_columns]
        self.lookup_degenerate = (
            all(v == 0 for v in pk.selector_polys.get("q_lookup", []))
            and all(all(x == 0 for x in c) for c in pk.table_columns))
        return self

    def q_lookup_zero_mask(self, cs, n):
        col = [x % M for x in cs.q_lookup] + [0] * (n - len(cs.q_lookup))
        return mont.is_zero(_to_dev(col))


def _pk_flatten(pk):
    children = (pk.sel_poly, pk.sigma_poly, pk.sigma_evals_n, pk.table_cols)
    aux = (pk.n, pk.log_n, pk.lookup_degenerate)
    return children, aux


def _pk_unflatten(aux, children):
    pk = DevProverKey.__new__(DevProverKey)
    pk.n, pk.log_n, pk.lookup_degenerate = aux
    (pk.sel_poly, pk.sigma_poly, pk.sigma_evals_n, pk.table_cols) = children
    return pk


jax.tree_util.register_pytree_node(DevProverKey, _pk_flatten, _pk_unflatten)


# NOTE on cross-process compile-cache stability (round 4 finding): the
# big programs' cache keys vary with the process's TRACE HISTORY — the
# nested-jit lowering cache makes a program's serialized StableHLO depend
# on which shared subfunctions were lowered earlier (measured: identical
# compile options, different computation hashes when _intt_jit was traced
# before _commit_batch_jit). Input-layout canonicalization via
# device_put(Format(...)) was tried and REVERTED: executables compiled
# against explicitly-committed layouts fail at runtime on the axon
# backend (INVALID_ARGUMENT). The working fix is deterministic trace
# order: bench.py warms the cache from a subprocess that replays the
# scored entrypoint exactly, so the driver's fresh process re-traces the
# same order and hits every entry.


# ---------------------------------------------------------------------------
# commitments
# ---------------------------------------------------------------------------

def _fold_windows(pts, wb):
    """xyzz dict (L, ..., W), windows LSB-first -> (L, ...): Horner fold
    sum_w 2^(wb*w) P_w as a fori_loop (one compiled body)."""
    Wn = pts["X"].shape[-1]
    acc = {k: jnp.zeros(v.shape[:-1], v.dtype) for k, v in pts.items()}

    def body(i, acc):
        w = Wn - 1 - i
        cur = {k: jax.lax.dynamic_index_in_dim(v, w, axis=-1, keepdims=False)
               for k, v in pts.items()}
        for _ in range(wb):
            acc = jg1.xyzz_double(acc)
        return jg1.xyzz_add(acc, cur)

    return jax.lax.fori_loop(0, Wn, body, acc)


@partial(jax.jit, static_argnames=("wb", "cap"))
def _commit_batch_jit(srs_x, srs_y, polys, off, wb, cap):
    """KZG commit a batch: polys (L, B, n) Montgomery coeffs ->
    (xyzz dict (L, B), overflow (B*W,)). kzg10.cu `commit` counterpart.
    Windows run in GROUPS of G per scan step (grouped slot grid +
    batched-affine bucket tree, `msm.msm_window_grid_batch`). `off` is the
    TRACED bucket pass offset: overflowing scalar distributions are
    drained by re-running this same program with off += cap and
    point-adding the results (commit_batch drives the loop) — the window
    fold is linear in the bucket sums, so per-pass folded commitments
    add to the true commitment."""
    L, B, n = polys.shape
    raw = mont.from_mont(FR, polys)                   # (16, B, n) raw limbs
    digits = jmsm.limbs16_to_digits(raw.reshape(16, B * n), wb)
    Wn = digits.shape[0]
    # (W, B, n) -> (B, W, n) so each poly's windows are contiguous
    digits = jnp.swapaxes(digits.reshape(Wn, B, n), 0, 1).reshape(
        B * Wn, n)
    G = jmsm.window_group_size(n, wb, B * Wn)
    while (B * Wn) % G:
        G //= 2
    dig_g = digits.reshape(B * Wn // G, G, n)

    def body(carry, d_g):
        pt, over = jmsm.msm_window_grid_batch(srs_x, srs_y, d_g, wb, cap,
                                              off)
        return carry, (pt, over)

    _, (pts, over) = jax.lax.scan(body, 0, dig_g)
    # pts: dict of (n_groups, Lq, G); points are xyzz over Fq
    ptsBW = {k: jnp.moveaxis(v, 1, 0).reshape(v.shape[1], B, Wn)
             for k, v in pts.items()}                 # (Lq, B, W)
    return _fold_windows(ptsBW, wb), over.reshape(-1)


_commit_batch_jit = aot.AotFn("commit_batch_jit", _commit_batch_jit)


@partial(jax.jit, static_argnames=("wb", "cap", "mesh", "axis"))
def _commit_batch_mesh_jit(srs_x, srs_y, polys, off, wb, cap, mesh, axis):
    """Meshed KZG commit batch: SRS points and scalars sharded over the
    mesh (data-parallel Pippenger). Each device runs the sort-based window
    grid on its point shard inside `shard_map` — the grid's argsort must
    stay device-local (the GSPMD partitioner turns a global sort into a
    compile-time explosion); window partials are all_gathered over ICI and
    tree-folded. `cap` is the PER-SHARD bucket capacity."""
    from jax.sharding import PartitionSpec as P
    L, B, n = polys.shape

    def step(xs, ys, ps, off):
        raw = mont.from_mont(FR, ps)                  # (16, B, nloc)
        nloc = raw.shape[-1]
        digits = jmsm.limbs16_to_digits(raw.reshape(16, B * nloc), wb)
        Wn = digits.shape[0]
        digits = jnp.swapaxes(digits.reshape(Wn, B, nloc), 0, 1).reshape(
            B * Wn, nloc)

        def body(carry, d_w):
            pt, over = jmsm.msm_window_grid(xs, ys, d_w, wb, cap, off)
            return carry, (pt, over)

        _, (pts, over) = jax.lax.scan(body, 0, digits)
        # pts: dict of (B*W, Lq) — limbs to the front before field math
        ptsT = {k: jnp.swapaxes(v, 0, 1) for k, v in pts.items()}
        gathered = {k: jax.lax.all_gather(v, axis, axis=2)
                    for k, v in ptsT.items()}         # (Lq, B*W, D)
        tot = jg1.xyzz_tree_sum(gathered)             # (Lq, B*W)
        return tot, jax.lax.psum(over, axis)

    f = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, None, axis), P()),
        out_specs=(P(), P()), check_vma=False)
    tot, over = f(srs_x, srs_y, polys, off)
    Wn = tot["X"].shape[1] // B
    ptsBW = {k: v.reshape(v.shape[0], B, Wn) for k, v in tot.items()}
    return _fold_windows(ptsBW, wb), over


def _xyzz_to_host_points(pts):
    """xyzz dict (L, B) -> list of B affine int points / None."""
    return jg1.xyzz_to_affine_host(pts)


@jax.jit
def _xyzz_acc_small_jit(p, q):
    """Accumulate per-pass chunk commitments ((L, COMMIT_CHUNK) adds) on
    the XLA path — tiny widths don't merit a pallas remote compile."""
    with mont.xla_only():
        return jg1.xyzz_add(p, q)


# Commits are chunked to a canonical batch width so EVERY commit in the
# proof (B = 4 wires, 3 lookup, 2 grand products, 8 quotient chunks, 2
# openings) reuses ONE compiled MSM program per n: the Pippenger window
# grid is by far the most expensive program to lower (~200 s of pure-Python
# jaxpr->MLIR per shape per process) and to compile; per-B shapes would
# pay it four times.
COMMIT_CHUNK = 2


def commit_batch(dev_srs, polys, cfg):
    """Commit (L, B, n) polys -> list of B host affine points."""
    n = polys.shape[2]
    if cfg.msm_backend == "host":
        from ..ref import kzg as ref_kzg
        out = []
        for b in range(polys.shape[1]):
            ints = FR.from_mont_host(np.asarray(polys[:, b]))
            out.append(ref_kzg.commit(dev_srs.ref, ints))
        return out
    wb = cfg.msm_window_bits or jmsm.auto_window_bits(n)
    srs_x = dev_srs.points[0][:, :n]
    srs_y = dev_srs.points[1][:, :n]
    meshed = cfg.mesh is not None and n % cfg.mesh.devices.size == 0
    n_local = n // cfg.mesh.devices.size if meshed else n
    cap = jmsm.bucket_capacity(n_local, wb)
    if meshed:
        srs_x, srs_y = cfg.shard_last((srs_x, srs_y))

    B = polys.shape[1]
    C = COMMIT_CHUNK          # fixed even for B=1: program sharing wins
    pad = (-B) % C
    if pad:
        polys = jnp.concatenate(
            [polys, jnp.zeros((polys.shape[0], pad, n), dtype=polys.dtype)],
            axis=1)

    # pass 0 for every chunk, ONE overflow pull; chunks whose scalar
    # distribution beats the Poisson capacity (selector polys: measured
    # worst bucket 2.03x cap at h13) get extra passes of the SAME
    # compiled program at off += cap — never a recompile at a bigger cap
    # (the old doubling retry compiled minutes-long programs mid-run and
    # at n=2^20 drove the TPU worker into the ground)
    def run_chunk(i, off):
        chunk = jax.lax.slice_in_dim(polys, i, i + C, axis=1)
        if meshed:
            return _commit_batch_mesh_jit(
                srs_x, srs_y, chunk, jnp.int32(off), wb, cap, cfg.mesh,
                cfg.mesh_axis)
        return _commit_batch_jit(srs_x, srs_y, chunk, jnp.int32(off),
                                 wb=wb, cap=cap)

    starts = list(range(0, B + pad, C))
    chunks, overs = [], []
    for i in starts:
        pts, over = run_chunk(i, 0)
        chunks.append(pts)
        overs.append(over)
    over_np = [int(np.asarray(o).sum()) for o in overs]
    for ci, i in enumerate(starts):
        off = cap
        while over_np[ci] and off < n_local:
            pts, over = run_chunk(i, off)
            chunks[ci] = _xyzz_acc_small_jit(chunks[ci], pts)
            over_np[ci] = int(np.asarray(over).sum())
            off += cap
    pts = {k: jnp.concatenate([c[k] for c in chunks], axis=1)[:, :B]
           for k in chunks[0]}
    return _xyzz_to_host_points(pts)


def commit(dev_srs, poly_mont, cfg):
    """Single-poly commit (preprocessing / tests)."""
    return commit_batch(dev_srs, poly_mont[:, None, :], cfg)[0]


class ProverWitness:
    """Per-proof inputs: wire value columns in evaluation form (device,
    Montgomery, (L, n)), sparse public inputs, and the q_lookup==0 mask."""

    def __init__(self, wires_dev, public_inputs, q_lookup_zero_mask):
        self.wires_dev = wires_dev
        self.public_inputs = public_inputs
        self.q_lookup_zero_mask = q_lookup_zero_mask

    @classmethod
    def from_composer(cls, cs, n):
        val = cs.variables
        wires_dev = []
        for wires in (cs.w_l, cs.w_r, cs.w_o, cs.w_4):
            col = [val[v] for v in wires] + [0] * (n - len(wires))
            wires_dev.append(_to_dev(col))
        col = [x % M for x in cs.q_lookup] + [0] * (n - len(cs.q_lookup))
        mask = mont.is_zero(_to_dev(col))
        return cls(wires_dev, dict(cs.public_inputs), mask)

    def replicate(self, device):
        """Copy with device arrays placed on `device` (whole-proof DP)."""
        put = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jax.device_put(x, device) if isinstance(x, jax.Array)
            else x, t)
        return ProverWitness(put(list(self.wires_dev)),
                             self.public_inputs,
                             put(self.q_lookup_zero_mask))


def _phase_timer():
    if os.environ.get("ZPRIZE_PROFILE") != "1":
        return lambda label, *arrs: None
    state = {"t": time.time()}

    def mark(label, *arrs):
        # block on REAL phase outputs (a fresh barrier op does NOT drain
        # the async queue on the axon runtime — round-1 lesson)
        for a in arrs:
            if a is not None:
                np.asarray(jax.tree.leaves(a)[0]).ravel()[:1]
        now = time.time()
        print(f"#   phase {label}: {now - state['t']:.2f}s", file=sys.stderr,
              flush=True)
        state["t"] = now
    return mark


# ---------------------------------------------------------------------------
# fused round programs
# ---------------------------------------------------------------------------

@jax.jit
def _intt_jit(plan, a):
    return jntt.transform_last(plan, a, True)


@jax.jit
def _z_parts_jit(roots, wires, sigma_evals, f, tcol, h1, h2,
                 beta, gamma, delta, eps):
    """Numerators/denominators + total products for the two grand products
    (permutation/mod.cu:44-144 counterpart)."""
    betaF, gammaF = FV(beta[:, None]), FV(gamma[:, None])
    rootsF = FV(roots)
    ks = [FV.const(k) for k in (1, K1, K2, K3)]
    numv = denv = None
    for w in range(4):
        wv = FV(wires[:, w])
        sv = FV(sigma_evals[:, w])
        nterm = wv + betaF * ks[w] * rootsF + gammaF
        dterm = wv + betaF * sv + gammaF
        numv = nterm if numv is None else numv * nterm
        denv = dterm if denv is None else denv * dterm

    one = FV.one()
    opd = FV(delta[:, None]) + one
    epsF = FV(eps[:, None])
    eps_opd = epsF * opd
    fv, tv = FV(f), FV(tcol)
    h1v, h2v = FV(h1), FV(h2)
    deltaF = FV(delta[:, None])
    t_next = tv.roll(1)
    h1_next = h1v.roll(1)
    num2 = opd * (epsF + fv) * (eps_opd + tv + deltaF * t_next)
    den2 = (eps_opd + h1v + h2v * deltaF) * \
        (eps_opd + h2v + h1_next * deltaF)

    tot_z = mont.prod_tree_total(FR, denv.v)
    tot_2 = mont.prod_tree_total(FR, den2.v)
    return numv.v, denv.v, tot_z, num2.v, den2.v, tot_2


@jax.jit
def _z_finish_jit(plan, num, den, inv_total):
    """ratios -> shifted prefix product -> INTT (z / z2 polynomial)."""
    dinv = mont.inv_apply(FR, den, inv_total)
    ratios = mont.mont_mul(FR, num, dinv)
    evals = jpoly.prefix_product(FR, ratios, shift_one=True)
    return jntt.transform_last(plan, evals, True), evals


def _sum_axis(a, axis):
    """Log-depth modular add-reduce along `axis` (any length)."""
    a = jnp.moveaxis(a, axis, -1)
    while a.shape[-1] > 1:
        if a.shape[-1] % 2:
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (1,), dtype=a.dtype)], axis=-1)
        a = mont.add(FR, a[..., 0::2], a[..., 1::2])
    return a[..., 0]


@jax.jit
def _quotient_jit(plan, sct, pk, wl, wr, wo, w4, z, z2, pi,
                  f, tcol, h1, h2, ch):
    """quotient_poly.rs compute(), one sub-coset at a time via `lax.scan`
    (quotient.cu:142-376 counterpart). All inputs are coefficient-form
    (L, n); ch is a dict of (L,) challenge limbs. Returns the 8 quotient
    chunk polys t_q stacked as (L, 8, n).

    Memory plan (the reference needs 62 GB and streams PK tables over PCIe,
    README:57): NO (L, 8, n) eval table is ever materialized — each scan
    step recomputes every polynomial's evals on sub-coset j = g·w8n^j·H by
    a shifted n-NTT, grouped so selector evals die right after their widget
    term: peak live memory is O(#polys · n), not O(#polys · 8n)."""
    degenerate = pk.lookup_degenerate
    n = wl.shape[-1]
    L = FR.L

    l1c = jnp.broadcast_to(plan.n_inv[:, None], (L, n))
    base = [wl, wr, wo, w4, z, z2, pi, l1c]
    if not degenerate:
        base += [f, tcol, h1, h2]
    base_st = jnp.stack(base, axis=1)               # (L, P, n)

    # selector groups, NTT'd separately per sub-coset so each group's evals
    # are freed once its widget term is folded into the numerator
    arith_names = ["q_arith", "q_m", "q_l", "q_r", "q_o", "q_4", "q_c",
                   "q_hl", "q_hr", "q_h4"]
    other_names = ["q_range", "q_logic", "q_lookup", "q_fixed_group_add",
                   "q_variable_group_add"]
    arith_st = jnp.stack([pk.sel_poly[k] for k in arith_names], axis=1)
    other_st = jnp.stack([pk.sel_poly[k] for k in other_names], axis=1)
    sigma_st = jnp.stack(pk.sigma_poly, axis=1)     # (L, 4, n)
    roots = sct.roots

    def c(name):
        return FV(ch[name][:, None])

    def body(acc, xs):
        shift, shift_inv, vh_inv_j, comb_j = xs
        # shift: (L, n) powers of s_j; comb_j: (L, 8) = combine_c[:, :, j]

        def evals(st):
            shifted = mont.mont_mul(FR, st, shift[:, None, :])
            return jntt.transform_last(plan, shifted, False)

        E = evals(base_st)

        def ev(i):
            return FV(E[:, i])

        def nxt(i):
            # "next gate" on the 8n domain (m -> m+8) is roll(-1) within
            # the same sub-coset (index map m = 8p + j)
            return FV(jnp.roll(E[:, i], -1, axis=-1))

        a, b, cw, d = ev(0), ev(1), ev(2), ev(3)
        a_n, b_n, d_n = nxt(0), nxt(1), nxt(3)
        zF, z_n = ev(4), nxt(4)
        z2F, z2_n = ev(5), nxt(5)
        piF = ev(6)
        l1F = ev(7)

        Ea = evals(arith_st)
        sel_a = {k: FV(Ea[:, i]) for i, k in enumerate(arith_names)}
        arith = W.arithmetic_constraint(
            sel_a["q_arith"], sel_a["q_m"], sel_a["q_l"], sel_a["q_r"],
            sel_a["q_o"], sel_a["q_4"], sel_a["q_c"], sel_a["q_hl"],
            sel_a["q_hr"], sel_a["q_h4"], a, b, cw, d)
        q_l, q_r, q_c = sel_a["q_l"], sel_a["q_r"], sel_a["q_c"]

        Eo = evals(other_st)
        sel_o = {k: FV(Eo[:, i]) for i, k in enumerate(other_names)}
        rng = sel_o["q_range"] * W.range_constraint(
            c("range"), a, b, cw, d, d_n)
        lgc = sel_o["q_logic"] * W.logic_constraint(
            c("logic"), a, b, cw, d, a_n, b_n, d_n, q_c)
        fbsm = sel_o["q_fixed_group_add"] * W.fbsm_constraint(
            c("fbsm"), a, b, cw, d, a_n, b_n, d_n, q_l, q_r,
            q_c, FV.const(JUBJUB_A), FV.const(JUBJUB_D))
        ca = sel_o["q_variable_group_add"] * W.ca_constraint(
            c("ca"), a, b, cw, d, a_n, b_n, d_n,
            FV.const(JUBJUB_A), FV.const(JUBJUB_D))
        gate = arith + piF + rng + lgc + fbsm + ca

        Eg = evals(sigma_st)
        sig = [FV(Eg[:, i]) for i in range(4)]
        # linear poly X evals on sub-coset j: s_j * w^p
        xF = FV(mont.mont_mul(FR, shift[:, 1:2], roots))
        alpha = c("alpha")
        l1_alpha_sq = l1F * alpha * alpha
        perm = W.permutation_quotient_term(
            xF, sig[0], sig[1], sig[2], sig[3], a, b, cw, d,
            zF, z_n, alpha, l1_alpha_sq, c("beta"), c("gamma"),
            FV.const(K1), FV.const(K2), FV.const(K3))

        if degenerate:
            # f = t = h1 = h2 = 0 identically: the lookup term collapses to
            # scalar-coefficient combinations of z2, z2_next, l1, q_lookup
            # (same algebra as widgets_jax.lookup_quotient_term with zeros).
            ls = c("lookup")
            ls2 = ls.sqr()
            ls3 = ls2 * ls
            one = FV.one()
            opd = c("delta") + one
            epsF = c("epsilon")
            eps_opd = epsF * opd
            compressed = W.lc4(a, b, cw, d, c("zeta"))
            term_a = sel_o["q_lookup"] * compressed * ls
            term_b = z2F * (opd * epsF * eps_opd) * ls2
            term_c = -(z2_n * eps_opd * eps_opd * ls2)
            term_d = (z2F - one) * l1F * ls3
            lkp = term_a + term_b + term_c + term_d
        else:
            fF = ev(8)
            tF, t_n = ev(9), nxt(9)
            h1F, h1_n = ev(10), nxt(10)
            h2F = ev(11)
            lkp = W.lookup_quotient_term(
                sel_o["q_lookup"], a, b, cw, d, fF, tF, t_n, h1F, h1_n,
                h2F, z2F, z2_n, l1F, c("delta"), c("epsilon"), c("zeta"),
                c("lookup"))

        numer = gate + perm + lkp
        Q = mont.mont_mul(FR, numer.v, vh_inv_j[:, None])
        Dq = jntt.transform_last(plan, Q, True)     # plain n-INTT
        D = mont.mont_mul(FR, Dq, shift_inv)        # (L, n)
        # t_{k+nq} += combine_c[q, j] * D_j[k]
        contrib = mont.mont_mul(FR, D[:, None, :], comb_j[:, :, None])
        return mont.add(FR, acc, contrib), None

    xs = (jnp.moveaxis(sct.shift_pows, 1, 0),       # (8, L, n)
          jnp.moveaxis(sct.shift_inv_pows, 1, 0),
          jnp.moveaxis(sct.vh_inv, 1, 0),           # (8, L)
          jnp.moveaxis(sct.combine_c, 2, 0))        # (8, L, 8) over j
    acc0 = jnp.zeros((L, 8, n), dtype=U32)
    acc, _ = jax.lax.scan(body, acc0, xs)
    return acc                                      # (L, 8, n)


@jax.jit
def _eval_at_jit(stack, point):
    """Evaluate K polys (L, K, n) at one point (L,) -> (L, K)."""
    n = stack.shape[-1]
    pows = jpoly.powers(FR, point, n)
    prods = mont.mont_mul(FR, stack, pows[:, None, :])
    return _sum_axis(prods, -1)


@jax.jit
def _lincomb_jit(stack, coeffs):
    """sum_k coeffs[:, k] * stack[:, k, :] -> (L, n)."""
    prods = mont.mont_mul(FR, stack, coeffs[:, :, None])
    return _sum_axis(prods, 1)


@jax.jit
def _open_jit(stack, coeffs, point):
    """chi-aggregation + synthetic division by (X - point)
    (kzg10.cu:87-146). Returns the witness poly padded back to n coeffs."""
    agg = _lincomb_jit(stack, coeffs)
    q, _ = jpoly.divide_linear(FR, agg, point)
    return jnp.concatenate(
        [q, jnp.zeros((q.shape[0], 1), dtype=q.dtype)], axis=1)


# AOT export store: replayed from .bench_cache/aot in warm processes —
# skips Python tracing (see aot.py). Plain jit is used inside traces, on
# meshed inputs, and on CPU.
_intt_jit = aot.AotFn("intt_jit", _intt_jit)
_z_parts_jit = aot.AotFn("z_parts_jit", _z_parts_jit)
_z_finish_jit = aot.AotFn("z_finish_jit", _z_finish_jit)
_quotient_jit = aot.AotFn("quotient_jit", _quotient_jit)
_eval_at_jit = aot.AotFn("eval_at_jit", _eval_at_jit)
_lincomb_jit = aot.AotFn("lincomb_jit", _lincomb_jit)
_open_jit = aot.AotFn("open_jit", _open_jit)


# ---------------------------------------------------------------------------
# the prover
# ---------------------------------------------------------------------------

def prove_tpu(witness: "ProverWitness", dev_pk: DevProverKey,
              dev_srs: DevSRS, transcript, cfg: ProverConfig = None):
    cfg = cfg or ProverConfig()
    mark = _phase_timer()
    n = dev_pk.n
    log_n = dev_pk.log_n
    plan = jntt.get_plan(log_n, cfg.device).warm()
    sct = jntt.get_subcoset_tables(log_n, cfg.device)
    t = transcript

    if cfg.mesh is not None:
        # multi-chip: shard every n-length axis over the mesh; the jitted
        # round programs below compile as SPMD with XLA-inserted collectives
        dev_pk = cfg.shard_last(dev_pk)
        sct = cfg.shard_last(sct)
        plan = cfg.shard_last(plan)
        sharded_wires = cfg.shard_last(list(witness.wires_dev))
        pub = witness.public_inputs
        witness = ProverWitness.__new__(ProverWitness)
        witness.wires_dev = sharded_wires
        witness.public_inputs = pub

    t.append_pi(b"pi", witness.public_inputs)

    # ------------------------------------------------------------- round 1
    # the sparse-PI dense column rides along as a 5th INTT row: its
    # coefficients aren't needed until round 4, but batching it here saves
    # a separate compiled program + dispatch. Built device-side from the
    # sparse dict (pi.rs:55-80 as_evals counterpart) — a host dense-list
    # conversion costs seconds of Python at n = 2^20.
    pi_col = jnp.zeros((FR.L, n), dtype=U32)
    if witness.public_inputs:
        pos = np.fromiter(witness.public_inputs.keys(), dtype=np.int64)
        vals = jnp.asarray(FR.to_mont_host(
            [v % M for v in witness.public_inputs.values()]))    # (L, k)
        pi_col = pi_col.at[:, pos].set(vals)
    wires5 = jnp.stack(list(witness.wires_dev) + [pi_col], axis=1)
    wires = wires5[:, :4]                               # (L, 4, n)
    polys5 = _intt_jit(plan, wires5)                    # (L, 5, n)
    wire_polys, pi_poly = polys5[:, :4], polys5[:, 4]
    w_comms = commit_batch(dev_srs, wire_polys, cfg)
    for label, c in zip((b"w_l", b"w_r", b"w_o", b"w_4"), w_comms):
        t.append_g1(label, c)

    # ------------------------------------------------------------- round 2
    mark("round1 (wires intt + 4 commits)", wire_polys)
    zeta_i = t.challenge_scalar(b"zeta")
    t.append_fr(b"zeta", zeta_i)
    zeta = FV.const(zeta_i)

    degenerate = bool(dev_pk.lookup_degenerate)
    zero_poly = jnp.zeros((FR.L, n), dtype=U32)
    if degenerate:
        # all-zero table & q_lookup: f = t = h1 = h2 = 0 identically and
        # their commitments are the identity point (matches the spec's
        # combine_split on all-zero multisets; reference shortcut:
        # gen_proof.cuh:107-115).
        compressed_t = zero_poly
        table_poly = zero_poly
        f_poly = zero_poly
        h_1 = zero_poly
        h_2 = zero_poly
        h_1_poly = zero_poly
        h_2_poly = zero_poly
        f_comm = None
        h_1_comm = None
        h_2_comm = None
    else:
        tc = [FV(c) for c in dev_pk.table_cols]
        compressed_t = W.lc4(tc[0], tc[1], tc[2], tc[3], zeta).v
        table_poly = jntt.intt(plan, compressed_t)

        q_lookup_is_zero = witness.q_lookup_zero_mask
        t0_bcast = jnp.broadcast_to(compressed_t[:, :1], compressed_t.shape)
        zero_col = jnp.zeros_like(compressed_t)
        f_cols = [
            mont.select(q_lookup_is_zero, t0_bcast, witness.wires_dev[0]),
            mont.select(q_lookup_is_zero, zero_col, witness.wires_dev[1]),
            mont.select(q_lookup_is_zero, zero_col, witness.wires_dev[2]),
            mont.select(q_lookup_is_zero, zero_col, witness.wires_dev[3]),
        ]
        compressed_f = W.lc4(FV(f_cols[0]), FV(f_cols[1]), FV(f_cols[2]),
                             FV(f_cols[3]), zeta).v
        f_poly = jntt.intt(plan, compressed_f)

        # combine_split on host (order-sensitive bucketing; O(n)) — native
        # C hash-map over raw 16-bit-limb rows where available
        raw_t = np.asarray(mont.from_mont(FR, compressed_t)).T.copy()
        raw_f = np.asarray(mont.from_mont(FR, compressed_f)).T.copy()
        try:
            from ..native import combine_split_bytes
            h1b, h2b = combine_split_bytes(
                raw_t.astype("<u2").tobytes(), raw_f.astype("<u2").tobytes(),
                n)
            h1_raw = np.frombuffer(h1b, "<u2").reshape(n, FR.L).astype(
                np.uint32)
            h2_raw = np.frombuffer(h2b, "<u2").reshape(n, FR.L).astype(
                np.uint32)
            h_1 = mont.to_mont(FR, jnp.asarray(h1_raw.T.copy()))
            h_2 = mont.to_mont(FR, jnp.asarray(h2_raw.T.copy()))
        except Exception:  # toolchain unavailable -> Python oracle path
            h_1_ints, h_2_ints = combine_split(
                limbs_to_ints(raw_t), limbs_to_ints(raw_f))
            h_1 = _to_dev(h_1_ints)
            h_2 = _to_dev(h_2_ints)
        h_1_poly = jntt.intt(plan, h_1)
        h_2_poly = jntt.intt(plan, h_2)
        f_comm, h_1_comm, h_2_comm = commit_batch(
            dev_srs, jnp.stack([f_poly, h_1_poly, h_2_poly], axis=1), cfg)
    t.append_g1(b"f", f_comm)
    t.append_g1(b"h1", h_1_comm)
    t.append_g1(b"h2", h_2_comm)

    # ------------------------------------------------------------- round 3
    mark("round2 (lookup compress + combine_split + 3 commits)", h_2_poly)
    beta_i = t.challenge_scalar(b"beta")
    t.append_fr(b"beta", beta_i)
    gamma_i = t.challenge_scalar(b"gamma")
    t.append_fr(b"gamma", gamma_i)
    delta_i = t.challenge_scalar(b"delta")
    t.append_fr(b"delta", delta_i)
    epsilon_i = t.challenge_scalar(b"epsilon")
    t.append_fr(b"epsilon", epsilon_i)
    assert len({beta_i, gamma_i, delta_i, epsilon_i}) == 4

    compressed_f_for_z2 = zero_poly if degenerate else compressed_f
    sigma_evals = jnp.stack(dev_pk.sigma_evals_n, axis=1)   # (L, 4, n)
    num_z, den_z, tot_z, num_2, den_2, tot_2 = _z_parts_jit(
        sct.roots, wires, sigma_evals, compressed_f_for_z2, compressed_t,
        h_1, h_2, _scal(beta_i), _scal(gamma_i), _scal(delta_i),
        _scal(epsilon_i))

    # the only mid-proof D2H syncs: two 64-byte total products
    tots = FR.from_mont_host(np.asarray(jnp.stack([tot_z, tot_2], axis=1)))
    inv_z = _scal(pow(tots[0], -1, M))
    inv_2 = _scal(pow(tots[1], -1, M))

    z_poly, _ = _z_finish_jit(plan, num_z, den_z, inv_z)
    z_2_poly, _ = _z_finish_jit(plan, num_2, den_2, inv_2)
    z_comm, z_2_comm = commit_batch(
        dev_srs, jnp.stack([z_poly, z_2_poly], axis=1), cfg)
    t.append_g1(b"z", z_comm)

    # ------------------------------------------------------------- round 4
    mark("round3 (z/z2 grand products + 2 commits)", z_2_poly)
    alpha_i = t.challenge_scalar(b"alpha")
    t.append_fr(b"alpha", alpha_i)
    range_i = t.challenge_scalar(b"range separation challenge")
    t.append_fr(b"range seperation challenge", range_i)
    logic_i = t.challenge_scalar(b"logic separation challenge")
    t.append_fr(b"logic seperation challenge", logic_i)
    fbsm_i = t.challenge_scalar(b"fixed base separation challenge")
    t.append_fr(b"fixed base separation challenge", fbsm_i)
    ca_i = t.challenge_scalar(b"variable base separation challenge")
    t.append_fr(b"variable base separation challenge", ca_i)
    lookup_i = t.challenge_scalar(b"lookup separation challenge")
    t.append_fr(b"lookup separation challenge", lookup_i)

    ch = {"alpha": _scal(alpha_i), "beta": _scal(beta_i),
          "gamma": _scal(gamma_i), "delta": _scal(delta_i),
          "epsilon": _scal(epsilon_i), "zeta": _scal(zeta_i),
          "range": _scal(range_i), "logic": _scal(logic_i),
          "fbsm": _scal(fbsm_i), "ca": _scal(ca_i),
          "lookup": _scal(lookup_i)}
    t_stack = _quotient_jit(
        plan, sct, dev_pk, wire_polys[:, 0], wire_polys[:, 1],
        wire_polys[:, 2], wire_polys[:, 3], z_poly, z_2_poly, pi_poly,
        f_poly, table_poly, h_1_poly, h_2_poly, ch)

    t_comms = commit_batch(dev_srs, t_stack, cfg)
    for i in range(8):
        t.append_g1(b"t_" + str(i + 1).encode(), t_comms[i])

    # ------------------------------------------------------------- round 5
    mark("round4 (quotient + 8 commits)", t_stack)
    z_ch_i = t.challenge_scalar(b"z")
    t.append_fr(b"z", z_ch_i)

    omega = jntt.get_plan(log_n).omega
    shifted_i = z_ch_i * omega % M

    sp = dev_pk.sel_poly
    at_z_polys = [wire_polys[:, 0], wire_polys[:, 1], wire_polys[:, 2],
                  wire_polys[:, 3],
                  dev_pk.sigma_poly[0], dev_pk.sigma_poly[1],
                  dev_pk.sigma_poly[2],
                  sp["q_arith"], sp["q_lookup"], sp["q_c"], sp["q_l"],
                  sp["q_r"], sp["q_hl"], sp["q_hr"], sp["q_h4"],
                  h_1_poly, h_2_poly, f_poly, table_poly]
    at_sz_polys = [z_poly, wire_polys[:, 0], wire_polys[:, 1],
                   wire_polys[:, 3], z_2_poly, h_1_poly, table_poly]
    evs_z = _eval_at_jit(jnp.stack(at_z_polys, axis=1), _scal(z_ch_i))
    evs_sz = _eval_at_jit(jnp.stack(at_sz_polys, axis=1), _scal(shifted_i))
    ints = FR.from_mont_host(
        np.asarray(jnp.concatenate([evs_z, evs_sz], axis=1)))
    (a_eval, b_eval, c_eval, d_eval, ls_eval, rs_eval, os_eval, q_arith_eval,
     q_lookup_eval, q_c_eval, q_l_eval, q_r_eval, q_hl_eval, q_hr_eval,
     q_h4_eval, h1_eval, h2_eval, f_eval, table_eval) = ints[:19]
    (perm_eval, a_next_eval, b_next_eval, d_next_eval, z2_next_eval,
     h1_next_eval, table_next_eval) = ints[19:]

    vanishing_eval = (pow(z_ch_i, n, M) - 1) % M
    z_to_n = (vanishing_eval + 1) % M
    l1_eval = vanishing_eval * pow(n * ((z_ch_i - 1) % M) % M, -1, M) % M

    evaluations = Evaluations(
        a_eval=a_eval, b_eval=b_eval, c_eval=c_eval, d_eval=d_eval,
        left_sigma_eval=ls_eval, right_sigma_eval=rs_eval,
        out_sigma_eval=os_eval, permutation_eval=perm_eval,
        q_lookup_eval=q_lookup_eval, z2_next_eval=z2_next_eval,
        h1_eval=h1_eval, h1_next_eval=h1_next_eval, h2_eval=h2_eval,
        f_eval=f_eval, table_eval=table_eval,
        table_next_eval=table_next_eval,
        custom_evals=[
            ("q_arith_eval", q_arith_eval), ("q_c_eval", q_c_eval),
            ("q_l_eval", q_l_eval), ("q_r_eval", q_r_eval),
            ("q_hl_eval", q_hl_eval), ("q_hr_eval", q_hr_eval),
            ("q_h4_eval", q_h4_eval), ("a_next_eval", a_next_eval),
            ("b_next_eval", b_next_eval), ("d_next_eval", d_next_eval),
        ])

    ev = evaluations
    t.append_fr(b"a_eval", ev.a_eval)
    t.append_fr(b"b_eval", ev.b_eval)
    t.append_fr(b"c_eval", ev.c_eval)
    t.append_fr(b"d_eval", ev.d_eval)
    t.append_fr(b"left_sig_eval", ev.left_sigma_eval)
    t.append_fr(b"right_sig_eval", ev.right_sigma_eval)
    t.append_fr(b"out_sig_eval", ev.out_sigma_eval)
    t.append_fr(b"perm_eval", ev.permutation_eval)
    t.append_fr(b"f_eval", ev.f_eval)
    t.append_fr(b"q_lookup_eval", ev.q_lookup_eval)
    t.append_fr(b"lookup_perm_eval", ev.z2_next_eval)
    t.append_fr(b"h_1_eval", ev.h1_eval)
    t.append_fr(b"h_1_next_eval", ev.h1_next_eval)
    t.append_fr(b"h_2_eval", ev.h2_eval)
    for label, value in ev.custom_evals:
        t.append_fr(label.encode(), value)

    # linearisation: scalar coefficients on host (exact spec formulas,
    # linearisation_poly.rs compute()), ONE device linear combination.
    from ..protocol.widgets import (range_constraint, logic_constraint,
                                    fbsm_constraint, ca_constraint, lc)

    lin_terms = []   # (poly (L, n), int coefficient)

    def add_term(poly, coeff):
        lin_terms.append((poly, coeff % M))

    ab = a_eval * b_eval % M
    add_term(sp["q_m"], ab * q_arith_eval)
    add_term(sp["q_l"], a_eval * q_arith_eval)
    add_term(sp["q_r"], b_eval * q_arith_eval)
    add_term(sp["q_o"], c_eval * q_arith_eval)
    add_term(sp["q_4"], d_eval * q_arith_eval)
    add_term(sp["q_hl"], pow(a_eval, 5, M) * q_arith_eval)
    add_term(sp["q_hr"], pow(b_eval, 5, M) * q_arith_eval)
    add_term(sp["q_h4"], pow(d_eval, 5, M) * q_arith_eval)
    add_term(sp["q_c"], q_arith_eval)
    add_term(sp["q_range"], range_constraint(
        range_i, a_eval, b_eval, c_eval, d_eval, d_next_eval))
    add_term(sp["q_logic"], logic_constraint(
        logic_i, a_eval, b_eval, c_eval, d_eval, a_next_eval, b_next_eval,
        d_next_eval, q_c_eval))
    add_term(sp["q_fixed_group_add"], fbsm_constraint(
        fbsm_i, a_eval, b_eval, c_eval, d_eval, a_next_eval, b_next_eval,
        d_next_eval, q_l_eval, q_r_eval, q_c_eval))
    add_term(sp["q_variable_group_add"], ca_constraint(
        ca_i, a_eval, b_eval, c_eval, d_eval, a_next_eval, b_next_eval,
        d_next_eval))

    # lookup portion
    ls2 = lookup_i * lookup_i % M
    ls3 = ls2 * lookup_i % M
    opd = (delta_i + 1) % M
    eps_opd = epsilon_i * opd % M
    compressed = lc([a_eval, b_eval, c_eval, d_eval], zeta_i)
    add_term(sp["q_lookup"], (compressed - f_eval) % M * lookup_i % M)
    b0 = (epsilon_i + f_eval) % M
    b1 = (eps_opd + table_eval + delta_i * table_next_eval) % M
    b2 = l1_eval * ls3 % M
    add_term(z_2_poly, (opd * b0 % M * b1 % M * ls2 + b2) % M)
    c0 = (-z2_next_eval) % M * ls2 % M
    c1 = (eps_opd + h2_eval + delta_i * h1_next_eval) % M
    add_term(h_1_poly, c0 * c1 % M)

    # permutation portion
    beta_z = beta_i * z_ch_i % M
    a0 = (a_eval + beta_z + gamma_i) % M
    a1 = (b_eval + K1 * beta_z + gamma_i) % M
    a2 = (c_eval + K2 * beta_z + gamma_i) % M
    a3 = (d_eval + K3 * beta_z + gamma_i) % M
    ident = a0 * a1 % M * a2 % M * a3 % M * alpha_i % M
    add_term(z_poly,
             (ident + l1_eval * (alpha_i * alpha_i % M)) % M)
    s0 = (a_eval + beta_i * ls_eval + gamma_i) % M
    s1 = (b_eval + beta_i * rs_eval + gamma_i) % M
    s2 = (c_eval + beta_i * os_eval + gamma_i) % M
    copy = s0 * s1 % M * s2 % M * beta_i % M * perm_eval % M * alpha_i % M
    add_term(dev_pk.sigma_poly[3], (-copy) % M)

    # quotient portion: -vanishing * sum_i z^(n*i) t_i
    zn_pow = 1
    for i in range(8):
        add_term(t_stack[:, i], (-vanishing_eval) % M * zn_pow % M)
        zn_pow = zn_pow * z_to_n % M

    lin_stack = jnp.stack([p for p, _ in lin_terms], axis=1)
    lin_coeffs = jnp.asarray(FR.to_mont_host([c for _, c in lin_terms]))
    lin_poly = _lincomb_jit(lin_stack, lin_coeffs)

    # ------------------------------------------------------------ openings
    mark("round5 (linearisation + evals)", lin_poly)
    aw_i = t.challenge_scalar(b"aggregate_witness")
    aw_polys = [lin_poly, dev_pk.sigma_poly[0], dev_pk.sigma_poly[1],
                dev_pk.sigma_poly[2], f_poly, h_2_poly, table_poly,
                wire_polys[:, 0], wire_polys[:, 1], wire_polys[:, 2],
                wire_polys[:, 3]]
    aw_chis = [pow(aw_i, k, M) for k in range(len(aw_polys))]
    aw_q = _open_jit(jnp.stack(aw_polys, axis=1),
                     jnp.asarray(FR.to_mont_host(aw_chis)), _scal(z_ch_i))

    saw_i = t.challenge_scalar(b"aggregate_witness")
    saw_polys = [z_poly, wire_polys[:, 0], wire_polys[:, 1],
                 wire_polys[:, 3], h_1_poly, z_2_poly, table_poly]
    saw_chis = [pow(saw_i, k, M) for k in range(len(saw_polys))]
    saw_q = _open_jit(jnp.stack(saw_polys, axis=1),
                      jnp.asarray(FR.to_mont_host(saw_chis)),
                      _scal(shifted_i))

    aw_opening, saw_opening = commit_batch(
        dev_srs, jnp.stack([aw_q, saw_q], axis=1), cfg)

    mark("openings (2 aggregates + 2 commits)", None)
    return Proof(
        a_comm=w_comms[0], b_comm=w_comms[1], c_comm=w_comms[2],
        d_comm=w_comms[3], z_comm=z_comm, f_comm=f_comm, h_1_comm=h_1_comm,
        h_2_comm=h_2_comm, z_2_comm=z_2_comm, t_comms=t_comms,
        aw_opening=aw_opening, saw_opening=saw_opening,
        evaluations=evaluations)
