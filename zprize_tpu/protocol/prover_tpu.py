"""TPU prover — the 5-round PLONK pipeline with all O(n) work as device array
programs (NTT, MSM, scans, widget evaluation) on limbs-leading (L, n)
tensors, mirroring `ref/prover.py` (the executable spec) round-for-round and
transcript-byte-for-byte. Counterpart of the reference's GPU `prove()`
(`lib/PLONK/src/gen_proof.cuh:10-489`).

Host keeps only O(1)/O(windows) work: Fiat-Shamir hashing, MSM window
folds, and scalar field inversions (64-byte round-trips). Large D2H
transfers are avoided entirely: the only per-proof pulls are commitments
(96 B each) and the 26 evaluations (32 B each). The plookup combine_split
is skipped on-device when the lookup system is degenerate (all-zero table
and q_lookup — true for the Merkle workload, as the reference hardcodes in
`gen_proof.cuh:107-115`; here the degenerate path provably equals the spec
value 0)."""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..params import R_MOD, K1, K2, K3
from ..fields import mont
from ..fields.mont import FR, U32
from ..fields.frvec import FV
from ..fields.limb import ints_to_limbs, limbs_to_ints
from ..ops import ntt as jntt
from ..ops import poly as jpoly
from ..ops import msm as jmsm
from ..curve import g1 as jg1
from ..protocol.proof import Proof, Evaluations
from ..protocol import widgets_jax as W
from ..ref.prover import combine_split

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


class ProverConfig:
    """msm_backend: 'device' runs the grid Pippenger on the accelerator
    (production); 'host' pulls scalars and uses the Python oracle MSM —
    kept for differential tests of everything-but-MSM."""

    def __init__(self, msm_backend="device", msm_window_bits=None):
        self.msm_backend = msm_backend
        self.msm_window_bits = msm_window_bits


class DevSRS:
    def __init__(self, srs, device=True):
        self.ref = srs
        self.size = len(srs.powers_of_g)
        self.points = (jg1.affine_points_to_device(srs.powers_of_g)
                       if device else None)


class DevProverKey:
    """Device-resident prover key (selector/sigma polys + 8n coset evals) —
    everything the GPU keeps/streams in `load_pk` (`load.cu:58-307`)."""

    lookup_degenerate = False

    @classmethod
    def from_ref(cls, pk):
        self = cls()
        self.n = pk.n
        self.log_n = pk.n.bit_length() - 1
        self.sel_poly = {k: _to_dev(v) for k, v in pk.selector_polys.items()}
        self.sel_8n = {k: _to_dev(v) for k, v in pk.selector_8n.items()}
        self.sigma_poly = [_to_dev(v) for v in pk.sigma_polys]
        self.sigma_8n = [_to_dev(v) for v in pk.sigma_8n]
        self.sigma_evals_n = [_to_dev(v) for v in pk.sigma_evals_n]
        self.linear_8n = _to_dev(pk.linear_8n)
        vh_inv = [pow(v, -1, M) for v in pk.v_h_coset_8n[:8]]
        self.v_h_inv_8n = _to_dev([vh_inv[i % 8] for i in range(8 * pk.n)])
        self.table_cols = [_to_dev(c) for c in pk.table_columns]
        self.lookup_degenerate = (
            all(v == 0 for v in pk.selector_polys.get("q_lookup", []))
            and all(all(x == 0 for x in c) for c in pk.table_columns))
        return self

    def q_lookup_zero_mask(self, cs, n):
        col = [x % M for x in cs.q_lookup] + [0] * (n - len(cs.q_lookup))
        return mont.is_zero(_to_dev(col))


def commit(dev_srs: DevSRS, poly_mont, cfg: ProverConfig):
    """KZG commit = MSM(SRS, from_mont(coeffs)) (kzg10.cu `commit`)."""
    n = poly_mont.shape[1]
    if cfg.msm_backend == "host":
        from ..ref import kzg as ref_kzg
        ints = FR.from_mont_host(np.asarray(poly_mont))
        return ref_kzg.commit(dev_srs.ref, ints)
    raw = mont.from_mont(FR, poly_mont)  # (16, n) raw limbs == digit source
    pts = (dev_srs.points[0][:, :n], dev_srs.points[1][:, :n])
    return jmsm.msm_device(pts, raw, cfg.msm_window_bits)


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


def prove_tpu(witness: "ProverWitness", dev_pk: DevProverKey,
              dev_srs: DevSRS, transcript, cfg: ProverConfig = None):
    cfg = cfg or ProverConfig()
    mark = _phase_timer()
    n = dev_pk.n
    log_n = dev_pk.log_n
    plan = jntt.get_plan(log_n)
    plan8 = jntt.get_plan(log_n + 3)
    t = transcript

    t.append_pi(b"pi", witness.public_inputs)

    # ------------------------------------------------------------- round 1
    wires_dev = witness.wires_dev
    wire_polys = [jntt.intt(plan, w) for w in wires_dev]
    w_comms = [commit(dev_srs, p, cfg) for p in wire_polys]
    for label, c in zip((b"w_l", b"w_r", b"w_o", b"w_4"), w_comms):
        t.append_g1(label, c)

    # ------------------------------------------------------------- round 2
    mark("round1 (wires intt + 4 commits)", wire_polys[3])
    zeta_i = t.challenge_scalar(b"zeta")
    t.append_fr(b"zeta", zeta_i)
    zeta = FV.const(zeta_i)

    degenerate = bool(dev_pk.lookup_degenerate)
    if degenerate:
        # all-zero table & q_lookup: f = t = h1 = h2 = 0 identically and
        # their commitments are the identity point (matches the spec's
        # combine_split on all-zero multisets; reference shortcut:
        # gen_proof.cuh:107-115).
        zero_poly = jnp.zeros((FR.L, n), dtype=U32)
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
            mont.select(q_lookup_is_zero, t0_bcast, wires_dev[0]),
            mont.select(q_lookup_is_zero, zero_col, wires_dev[1]),
            mont.select(q_lookup_is_zero, zero_col, wires_dev[2]),
            mont.select(q_lookup_is_zero, zero_col, wires_dev[3]),
        ]
        compressed_f = W.lc4(FV(f_cols[0]), FV(f_cols[1]), FV(f_cols[2]),
                             FV(f_cols[3]), zeta).v
        f_poly = jntt.intt(plan, compressed_f)
        f_comm = commit(dev_srs, f_poly, cfg)

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
        h_1_comm = commit(dev_srs, h_1_poly, cfg)
        h_2_comm = commit(dev_srs, h_2_poly, cfg)
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
    beta, gamma = FV.const(beta_i), FV.const(gamma_i)
    delta_ch, epsilon = FV.const(delta_i), FV.const(epsilon_i)

    z_evals = compute_permutation_evals(
        plan, wires_dev, dev_pk.sigma_evals_n, beta, gamma)
    z_poly = jntt.intt(plan, z_evals)
    z_comm = commit(dev_srs, z_poly, cfg)
    t.append_g1(b"z", z_comm)

    if degenerate:
        compressed_f_for_z2 = jnp.zeros((FR.L, n), dtype=U32)
    else:
        compressed_f_for_z2 = compressed_f
    z2_evals = compute_lookup_permutation_evals(
        compressed_f_for_z2, compressed_t, h_1, h_2, delta_ch, epsilon)
    z_2_poly = jntt.intt(plan, z2_evals)
    z_2_comm = commit(dev_srs, z_2_poly, cfg)

    pi_dense = [0] * n
    for pos, v in witness.public_inputs.items():
        pi_dense[pos] = v
    pi_poly = jntt.intt(plan, _to_dev(pi_dense))

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

    t_coeffs = compute_quotient_device(
        plan, plan8, dev_pk, z_poly, z_2_poly, wire_polys, pi_poly, f_poly,
        table_poly, h_1_poly, h_2_poly,
        alpha_i, beta_i, gamma_i, delta_i, epsilon_i, zeta_i,
        range_i, logic_i, fbsm_i, ca_i, lookup_i)

    t_i_polys = [t_coeffs[:, i * n:(i + 1) * n] for i in range(8)]
    t_comms = [commit(dev_srs, p, cfg) for p in t_i_polys]
    for i in range(8):
        t.append_g1(b"t_" + str(i + 1).encode(), t_comms[i])

    # ------------------------------------------------------------- round 5
    mark("round4 (quotient + 8 commits)", t_coeffs)
    z_ch_i = t.challenge_scalar(b"z")
    t.append_fr(b"z", z_ch_i)

    lin_poly, evaluations = compute_linearisation_device(
        plan, dev_pk, alpha_i, beta_i, gamma_i, delta_i, epsilon_i, zeta_i,
        range_i, logic_i, fbsm_i, ca_i, lookup_i, z_ch_i,
        wire_polys, t_i_polys, z_poly, z_2_poly, f_poly, h_1_poly, h_2_poly,
        table_poly)

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

    # ------------------------------------------------------------ openings
    mark("round5 (linearisation + evals)", lin_poly)
    aw_i = t.challenge_scalar(b"aggregate_witness")
    aw_polys = [lin_poly, dev_pk.sigma_poly[0], dev_pk.sigma_poly[1],
                dev_pk.sigma_poly[2], f_poly, h_2_poly, table_poly,
                wire_polys[0], wire_polys[1], wire_polys[2], wire_polys[3]]
    aw_opening = open_aggregate_device(dev_srs, aw_polys, z_ch_i, aw_i, cfg)

    saw_i = t.challenge_scalar(b"aggregate_witness")
    omega = plan.omega
    shifted = z_ch_i * omega % M
    saw_polys = [z_poly, wire_polys[0], wire_polys[1], wire_polys[3],
                 h_1_poly, z_2_poly, table_poly]
    saw_opening = open_aggregate_device(dev_srs, saw_polys, shifted, saw_i,
                                        cfg)

    mark("openings (2 aggregates + 2 commits)", None)
    return Proof(
        a_comm=w_comms[0], b_comm=w_comms[1], c_comm=w_comms[2],
        d_comm=w_comms[3], z_comm=z_comm, f_comm=f_comm, h_1_comm=h_1_comm,
        h_2_comm=h_2_comm, z_2_comm=z_2_comm, t_comms=t_comms,
        aw_opening=aw_opening, saw_opening=saw_opening,
        evaluations=evaluations)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def compute_permutation_evals(plan, wires_dev, sigma_evals, beta, gamma):
    """Grand-product z(X) evals: ratios + batched inversion + prefix product
    (permutation/mod.cu:44-144 counterpart)."""
    n = wires_dev[0].shape[1]
    roots = FV(jpoly.powers(FR, jnp.asarray(FR.scalar_mont(plan.omega)), n))
    ks = [FV.const(k) for k in (1, K1, K2, K3)]
    numv = None
    denv = None
    for w in range(4):
        wv = FV(wires_dev[w])
        sv = FV(sigma_evals[w])
        nterm = wv + beta * ks[w] * roots + gamma
        dterm = wv + beta * sv + gamma
        numv = nterm if numv is None else numv * nterm
        denv = dterm if denv is None else denv * dterm
    dinv = FV(mont.batch_inv(FR, denv.v))
    ratios = (numv * dinv).v
    return jpoly.prefix_product(FR, ratios, shift_one=True)


def compute_lookup_permutation_evals(f, tcol, h1, h2, delta_ch, epsilon):
    one = FV.one()
    opd = delta_ch + one
    eps_opd = epsilon * opd
    fv, tv = FV(f), FV(tcol)
    h1v, h2v = FV(h1), FV(h2)
    t_next = tv.roll(1)
    h1_next = h1v.roll(1)
    num = opd * (epsilon + fv) * (eps_opd + tv + delta_ch * t_next)
    den = (eps_opd + h1v + h2v * delta_ch) * \
        (eps_opd + h2v + h1_next * delta_ch)
    dinv = FV(mont.batch_inv(FR, den.v))
    ratios = (num * dinv).v
    return jpoly.prefix_product(FR, ratios, shift_one=True)


def _wrap8(e):
    return jnp.concatenate([e, e[:, :8]], axis=1)


def compute_quotient_device(plan, plan8, dev_pk, z_poly, z2_poly, wire_polys,
                            pi_poly, f_poly, table_poly, h1_poly, h2_poly,
                            alpha_i, beta_i, gamma_i, delta_i, epsilon_i,
                            zeta_i, range_i, logic_i, fbsm_i, ca_i, lookup_i):
    """quotient_poly.rs compute() vectorized over the 8n coset
    (quotient.cu:142-376 counterpart)."""
    from ..params import JUBJUB_A, JUBJUB_D
    n = dev_pk.n
    n8 = 8 * n

    def lift(p):
        return jnp.concatenate(
            [p, jnp.zeros((FR.L, n8 - p.shape[1]), dtype=U32)], axis=1)

    def cfft(p):
        return jntt.coset_ntt(plan8, lift(p))

    l1_coeffs = _to_dev([pow(n, -1, M)] * n)
    l1_8 = cfft(l1_coeffs)
    alpha = FV.const(alpha_i)
    alpha_sq_l1 = (FV(l1_8) * alpha * alpha).v

    z8 = _wrap8(cfft(z_poly))
    wl8 = _wrap8(cfft(wire_polys[0]))
    wr8 = _wrap8(cfft(wire_polys[1]))
    wo8 = cfft(wire_polys[2])
    w48 = _wrap8(cfft(wire_polys[3]))
    z28 = _wrap8(cfft(z2_poly))
    f8 = cfft(f_poly)
    t8 = _wrap8(cfft(table_poly))
    h18 = _wrap8(cfft(h1_poly))
    h28 = cfft(h2_poly)
    pi8 = cfft(pi_poly)

    sel = {k: FV(v) for k, v in dev_pk.sel_8n.items()}
    a, b = FV(wl8[:, :n8]), FV(wr8[:, :n8])
    c, d = FV(wo8), FV(w48[:, :n8])
    a_n, b_n, d_n = FV(wl8[:, 8:]), FV(wr8[:, 8:]), FV(w48[:, 8:])

    arith = W.arithmetic_constraint(
        sel["q_arith"], sel["q_m"], sel["q_l"], sel["q_r"], sel["q_o"],
        sel["q_4"], sel["q_c"], sel["q_hl"], sel["q_hr"], sel["q_h4"],
        a, b, c, d)
    rng = sel["q_range"] * W.range_constraint(
        FV.const(range_i), a, b, c, d, d_n)
    lgc = sel["q_logic"] * W.logic_constraint(
        FV.const(logic_i), a, b, c, d, a_n, b_n, d_n, sel["q_c"])
    fbsm = sel["q_fixed_group_add"] * W.fbsm_constraint(
        FV.const(fbsm_i), a, b, c, d, a_n, b_n, d_n, sel["q_l"], sel["q_r"],
        sel["q_c"], FV.const(JUBJUB_A), FV.const(JUBJUB_D))
    ca = sel["q_variable_group_add"] * W.ca_constraint(
        FV.const(ca_i), a, b, c, d, a_n, b_n, d_n,
        FV.const(JUBJUB_A), FV.const(JUBJUB_D))
    gate = arith + FV(pi8) + rng + lgc + fbsm + ca

    perm = W.permutation_quotient_term(
        FV(dev_pk.linear_8n), FV(dev_pk.sigma_8n[0]), FV(dev_pk.sigma_8n[1]),
        FV(dev_pk.sigma_8n[2]), FV(dev_pk.sigma_8n[3]), a, b, c, d,
        FV(z8[:, :n8]), FV(z8[:, 8:]), alpha, FV(alpha_sq_l1),
        FV.const(beta_i), FV.const(gamma_i),
        FV.const(K1), FV.const(K2), FV.const(K3))

    lkp = W.lookup_quotient_term(
        sel["q_lookup"], a, b, c, d, FV(f8), FV(t8[:, :n8]), FV(t8[:, 8:]),
        FV(h18[:, :n8]), FV(h18[:, 8:]), FV(h28), FV(z28[:, :n8]),
        FV(z28[:, 8:]), FV(l1_8), FV.const(delta_i), FV.const(epsilon_i),
        FV.const(zeta_i), FV.const(lookup_i))

    numer = gate + perm + lkp
    quotient = numer * FV(dev_pk.v_h_inv_8n)
    return jntt.coset_intt(plan8, quotient.v)


def _eval_at(polys, pows):
    return [jpoly.poly_eval(FR, p, pows) for p in polys]


def compute_linearisation_device(plan, dev_pk, alpha_i, beta_i, gamma_i,
                                 delta_i, epsilon_i, zeta_i, range_i, logic_i,
                                 fbsm_i, ca_i, lookup_i, z_ch_i, wire_polys,
                                 t_i_polys, z_poly, z_2_poly, f_poly, h1_poly,
                                 h2_poly, table_poly):
    """linearisation_poly.rs compute() with device evaluations (powers-table
    dot products) and device poly combination (linearisation.cu:73-308)."""
    n = dev_pk.n
    omega = plan.omega
    shifted_i = z_ch_i * omega % M

    pows_z = jpoly.powers(FR, jnp.asarray(FR.scalar_mont(z_ch_i)), n)
    pows_sz = jpoly.powers(FR, jnp.asarray(FR.scalar_mont(shifted_i)), n)

    sp = dev_pk.sel_poly
    at_z = _eval_at(
        [wire_polys[0], wire_polys[1], wire_polys[2], wire_polys[3],
         dev_pk.sigma_poly[0], dev_pk.sigma_poly[1], dev_pk.sigma_poly[2],
         sp["q_arith"], sp["q_lookup"], sp["q_c"], sp["q_l"], sp["q_r"],
         sp["q_hl"], sp["q_hr"], sp["q_h4"],
         h1_poly, h2_poly, f_poly, table_poly], pows_z)
    at_sz = _eval_at(
        [z_poly, wire_polys[0], wire_polys[1], wire_polys[3], z_2_poly,
         h1_poly, table_poly], pows_sz)

    batch = jnp.stack(at_z + at_sz, axis=1)    # (L, 26)
    ints = FR.from_mont_host(np.asarray(batch))
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

    # gate constraints portion (scalar coefficients x selector polys)
    from ..protocol.widgets import (range_constraint, logic_constraint,
                                    fbsm_constraint, ca_constraint, lc)

    def spoly(name):
        return FV(sp[name])

    gate = (spoly("q_m") * FV.const(a_eval * b_eval % M)
            + spoly("q_l") * FV.const(a_eval)
            + spoly("q_r") * FV.const(b_eval)
            + spoly("q_o") * FV.const(c_eval)
            + spoly("q_4") * FV.const(d_eval)
            + spoly("q_hl") * FV.const(pow(a_eval, 5, M))
            + spoly("q_hr") * FV.const(pow(b_eval, 5, M))
            + spoly("q_h4") * FV.const(pow(d_eval, 5, M))
            + spoly("q_c")) * FV.const(q_arith_eval)

    gate = gate + spoly("q_range") * FV.const(range_constraint(
        range_i, a_eval, b_eval, c_eval, d_eval, d_next_eval))
    gate = gate + spoly("q_logic") * FV.const(logic_constraint(
        logic_i, a_eval, b_eval, c_eval, d_eval, a_next_eval, b_next_eval,
        d_next_eval, q_c_eval))
    gate = gate + spoly("q_fixed_group_add") * FV.const(fbsm_constraint(
        fbsm_i, a_eval, b_eval, c_eval, d_eval, a_next_eval, b_next_eval,
        d_next_eval, q_l_eval, q_r_eval, q_c_eval))
    gate = gate + spoly("q_variable_group_add") * FV.const(ca_constraint(
        ca_i, a_eval, b_eval, c_eval, d_eval, a_next_eval, b_next_eval,
        d_next_eval))

    # lookup portion
    ls2 = lookup_i * lookup_i % M
    ls3 = ls2 * lookup_i % M
    opd = (delta_i + 1) % M
    eps_opd = epsilon_i * opd % M
    compressed = lc([a_eval, b_eval, c_eval, d_eval], zeta_i)
    lkp = spoly("q_lookup") * FV.const(
        (compressed - f_eval) % M * lookup_i % M)
    b0 = (epsilon_i + f_eval) % M
    b1 = (eps_opd + table_eval + delta_i * table_next_eval) % M
    b2 = l1_eval * ls3 % M
    lkp = lkp + FV(z_2_poly) * FV.const(
        (opd * b0 % M * b1 % M * ls2 + b2) % M)
    c0 = (-z2_next_eval) % M * ls2 % M
    c1 = (eps_opd + h2_eval + delta_i * h1_next_eval) % M
    lkp = lkp + FV(h1_poly) * FV.const(c0 * c1 % M)

    # permutation portion
    beta_z = beta_i * z_ch_i % M
    a0 = (a_eval + beta_z + gamma_i) % M
    a1 = (b_eval + K1 * beta_z + gamma_i) % M
    a2 = (c_eval + K2 * beta_z + gamma_i) % M
    a3 = (d_eval + K3 * beta_z + gamma_i) % M
    ident = a0 * a1 % M * a2 % M * a3 % M * alpha_i % M
    perm = FV(z_poly) * FV.const(ident)
    s0 = (a_eval + beta_i * ls_eval + gamma_i) % M
    s1 = (b_eval + beta_i * rs_eval + gamma_i) % M
    s2 = (c_eval + beta_i * os_eval + gamma_i) % M
    copy = s0 * s1 % M * s2 % M * beta_i % M * perm_eval % M * alpha_i % M
    perm = perm + FV(dev_pk.sigma_poly[3]) * FV.const((-copy) % M)
    perm = perm + FV(z_poly) * FV.const(
        l1_eval * (alpha_i * alpha_i % M) % M)

    quot = FV(t_i_polys[7])
    zn = FV.const(z_to_n)
    for idx in range(6, -1, -1):
        quot = quot * zn + FV(t_i_polys[idx])
    neg_quot = quot * FV.const((-vanishing_eval) % M)

    lin = gate + perm + lkp + neg_quot
    return lin.v, evaluations


def open_aggregate_device(dev_srs, polys, point_i, challenge_i, cfg):
    """chi-aggregation + synthetic division + MSM (kzg10.cu:87-146)."""
    agg = None
    chi = 1
    for p in polys:
        scaled = FV(p) * FV.const(chi)
        agg = scaled if agg is None else agg + scaled
        chi = chi * challenge_i % M
    q, _ = jpoly.divide_linear(FR, agg.v,
                               jnp.asarray(FR.scalar_mont(point_i)))
    return commit(dev_srs, q, cfg)
