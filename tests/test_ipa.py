"""IPA polynomial commitment (transparent-setup alternative to KZG)."""

import random

from zprize_tpu.ref import ipa
from zprize_tpu.ref.domain import poly_eval
from zprize_tpu.params import R_MOD


def test_ipa_commit_open_check():
    rng = random.Random(1)
    params = ipa.IpaParams(32)
    coeffs = [rng.randrange(R_MOD) for _ in range(20)]  # shorter than n
    commitment = ipa.commit(params, coeffs)
    z = rng.randrange(R_MOD)
    v, proof = ipa.open_proof(params, coeffs, z)
    assert v == poly_eval(coeffs, z)
    assert len(proof["L"]) == 5  # log2(32) rounds
    assert ipa.check(params, commitment, z, v, proof)
    assert not ipa.check(params, commitment, z, (v + 1) % R_MOD, proof)
    assert not ipa.check(params, commitment, (z + 1) % R_MOD, v, proof)
    bad = dict(proof)
    bad["a"] = (proof["a"] + 1) % R_MOD
    assert not ipa.check(params, commitment, z, v, bad)


def test_ipa_as_plonk_pc_e2e():
    """Full PLONK prove+verify with the IPA backend — the reference's
    HomomorphicCommitment parameterization over a transparent-setup PC
    (commitment.rs:52-56; test matrix test.rs:15-118)."""
    from zprize_tpu.circuit.composer import StandardComposer
    from zprize_tpu.ref import prover as rp
    from zprize_tpu.ref.verifier import verify
    from zprize_tpu.ref.pc import IpaPC
    from zprize_tpu.ref.kzg import SRS
    from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol

    cs = StandardComposer()
    a = cs.add_input(20)
    b = cs.add_input(5)
    e = cs.mul(a, b)
    cs.constrain_to_constant(e, 100)
    cs.check_circuit_satisfied()

    n = cs.circuit_bound()
    pc = IpaPC(__import__('zprize_tpu.ref.ipa', fromlist=['ipa'])
               .IpaParams(8 * n))
    srs = SRS.setup(0)          # unused by IPA paths; h/beta_h only

    tr = TranscriptProtocol(b"ipa-e2e")
    pk, vk = rp.preprocess(cs, srs, tr, pc=pc)
    proof = rp.prove(cs, pk, srs, tr, pc=pc)

    vtr = TranscriptProtocol(b"ipa-e2e")
    rp.seed_transcript(vtr, vk)
    assert verify(vk, srs, proof, cs.public_inputs, vtr, pc=pc)

    # tampered evaluation must fail under IPA too
    proof.evaluations.a_eval = (proof.evaluations.a_eval + 1) % R_MOD
    vtr = TranscriptProtocol(b"ipa-e2e")
    rp.seed_transcript(vtr, vk)
    assert not verify(vk, srs, proof, cs.public_inputs, vtr, pc=pc)
