"""Vectorized Merkle layout vs the composer path: identical circuit
structure, identical witness, identical (verifying) proofs."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from zprize_tpu.params import R_MOD
from zprize_tpu.circuit.composer import StandardComposer, SELECTOR_NAMES
from zprize_tpu.circuit.permutation import compute_sigma_polynomials
from zprize_tpu.poseidon.constants import PoseidonConstants
from zprize_tpu.merkle.tree import MerkleTree
from zprize_tpu.merkle.circuit import gen_constraints
from zprize_tpu.merkle.layout import MerkleLayout
from zprize_tpu.merkle.preprocess import preprocess_layout
from zprize_tpu.fields.mont import FR
from zprize_tpu.ref.domain import Domain
from zprize_tpu.ref import prover as rp
from zprize_tpu.ref.verifier import verify
from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol
from zprize_tpu.protocol import prover_tpu as tp

H = 3


def _setup(h=H, seed=7):
    # (param, leaves, tree)
    rng = random.Random(seed)
    param = PoseidonConstants.generate(3)
    leaves = [rng.randrange(R_MOD) for _ in range(1 << (h - 1))]
    return param, leaves, MerkleTree(param, leaves, h)


def test_layout_structure_matches_composer():
    param, leaves, tree = _setup()
    cs = StandardComposer()
    gen_constraints(tree, cs, param)
    n = cs.circuit_bound()
    cs.pad_to(n)
    lay = MerkleLayout(H)
    assert lay.n == n
    for name in SELECTOR_NAMES:
        assert [x % R_MOD for x in getattr(cs, name)] == \
            FR.from_mont_host(lay.selector_limbs[name]), name
    cols = [cs.w_l, cs.w_r, cs.w_o, cs.w_4]
    for s in range(4):
        assert list(lay.wire_index[:, s]) == cols[s]
    d = Domain(n)
    _, evals_cs = compute_sigma_polynomials(cs, n, d)
    evals_lay = [FR.from_mont_host(np.asarray(e))
                 for e in lay.sigma_evals_device()]
    assert evals_lay == evals_cs


def test_layout_witness_matches_composer():
    param, leaves, tree = _setup()
    cs = StandardComposer()
    gen_constraints(tree, cs, param)
    n = cs.circuit_bound()
    cs.pad_to(n)
    lay = MerkleLayout(H)
    wires, root_val, _ = lay.witness(jnp.asarray(FR.to_mont_host(leaves)))
    assert root_val == tree.root()
    val = cs.variables
    for s, col in enumerate([cs.w_l, cs.w_r, cs.w_o, cs.w_4]):
        assert FR.from_mont_host(np.asarray(wires[s])) == \
            [val[v] for v in col]


@pytest.mark.slow
def test_layout_merkle_proof_e2e(srs_1k):
    """Full pipeline: layout preprocessing + layout witness + TPU prover;
    proof must equal the composer+spec proof and verify."""
    param, leaves, tree = _setup()
    cs = StandardComposer()
    gen_constraints(tree, cs, param)

    # spec path
    tr_ref = TranscriptProtocol(b"Merkle tree")
    pk_ref, vk_ref = rp.preprocess(cs, srs_1k, tr_ref)
    proof_ref = rp.prove(cs, pk_ref, srs_1k, tr_ref.clone())

    # layout path
    lay = MerkleLayout(H)
    dev_srs = tp.DevSRS(srs_1k, device=False)
    cfg = tp.ProverConfig(msm_backend="host")
    tr = TranscriptProtocol(b"Merkle tree")
    dev_pk, vk = preprocess_layout(lay, dev_srs, tr, cfg)
    assert vk.commitments == vk_ref.commitments

    wires, root_val, _ = lay.witness(jnp.asarray(FR.to_mont_host(leaves)))
    witness = tp.ProverWitness(
        wires, {lay.root_gate_pos: (-root_val) % R_MOD},
        jnp.ones((lay.n,), dtype=bool))
    proof = tp.prove_tpu(witness, dev_pk, dev_srs, tr, cfg)

    assert proof.evaluations == proof_ref.evaluations
    assert proof.t_comms == proof_ref.t_comms
    assert proof.aw_opening == proof_ref.aw_opening
    assert proof.saw_opening == proof_ref.saw_opening

    vtr = TranscriptProtocol(b"Merkle tree")
    rp.seed_transcript(vtr, vk)
    assert verify(vk, srs_1k, proof, witness.public_inputs, vtr)


@pytest.mark.slow
def test_layout_merkle_height4_e2e():
    """BASELINE config ladder item: height-4 Merkle end-to-end proof
    (layout path, host MSM), verified in-repo."""
    from tests.conftest import cached
    from zprize_tpu.ref.kzg import SRS

    def build():
        s = SRS.setup(1 << 11, tau=987654321)
        return (s.powers_of_g, s.h, s.beta_h)

    powers, h, beta_h = cached("srs_2k", build)
    srs = SRS(powers, h, beta_h)

    param, leaves, tree = _setup(h=4, seed=11)
    lay = MerkleLayout(4)
    assert lay.n == 2048
    dev_srs = tp.DevSRS(srs, device=False)
    cfg = tp.ProverConfig(msm_backend="host")
    tr = TranscriptProtocol(b"Merkle tree")
    dev_pk, vk = preprocess_layout(lay, dev_srs, tr, cfg)
    wires, root_val, _ = lay.witness(jnp.asarray(FR.to_mont_host(leaves)))
    assert root_val == tree.root()
    witness = tp.ProverWitness(
        wires, {lay.root_gate_pos: (-root_val) % R_MOD},
        jnp.ones((lay.n,), dtype=bool))
    proof = tp.prove_tpu(witness, dev_pk, dev_srs, tr, cfg)
    vtr = TranscriptProtocol(b"Merkle tree")
    rp.seed_transcript(vtr, vk)
    assert verify(vk, srs, proof, witness.public_inputs, vtr)
