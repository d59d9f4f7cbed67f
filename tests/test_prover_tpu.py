"""The TPU prover must produce BYTE-IDENTICAL proofs to the executable spec
(and they must verify). This is the central differential test of the whole
device pipeline (NTT, scans, widget math, linearisation, openings)."""

import pytest

from zprize_tpu.params import R_MOD
from zprize_tpu.circuit.composer import StandardComposer
from zprize_tpu.ref import prover as rp
from zprize_tpu.ref.verifier import verify
from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol
from zprize_tpu.protocol import prover_tpu as tp


def _build_circuit():
    cs = StandardComposer()
    a = cs.add_input(20)
    b = cs.add_input(5)
    cs.arithmetic_gate(q_l=1, q_r=1, w_l=a, w_r=b, q_o=0, w_o=cs.zero_var,
                       pi=(-25) % R_MOD)
    e = cs.mul(a, b)
    cs.constrain_to_constant(e, 100)
    cs.range_gate(a, 6)
    return cs


def _proofs_equal(p1, p2):
    assert p1.a_comm == p2.a_comm
    assert p1.b_comm == p2.b_comm
    assert p1.c_comm == p2.c_comm
    assert p1.d_comm == p2.d_comm
    assert p1.f_comm == p2.f_comm
    assert p1.h_1_comm == p2.h_1_comm
    assert p1.h_2_comm == p2.h_2_comm
    assert p1.z_comm == p2.z_comm
    assert p1.z_2_comm == p2.z_2_comm
    assert p1.t_comms == p2.t_comms
    assert p1.evaluations == p2.evaluations
    assert p1.aw_opening == p2.aw_opening
    assert p1.saw_opening == p2.saw_opening


@pytest.mark.slow
def test_tpu_prover_bit_exact(srs_1k):
    cs = _build_circuit()
    tr = TranscriptProtocol(b"test")
    pk, vk = rp.preprocess(cs, srs_1k, tr)

    proof_ref = rp.prove(cs, pk, srs_1k, tr.clone())

    dev_pk = tp.DevProverKey.from_ref(pk)
    dev_srs = tp.DevSRS(srs_1k, device=False)
    cfg = tp.ProverConfig(msm_backend="host")
    witness = tp.ProverWitness.from_composer(cs, pk.n)
    proof_tpu = tp.prove_tpu(witness, dev_pk, dev_srs, tr.clone(), cfg)

    _proofs_equal(proof_ref, proof_tpu)

    vtr = TranscriptProtocol(b"test")
    rp.seed_transcript(vtr, vk)
    assert verify(vk, srs_1k, proof_tpu, cs.public_inputs, vtr)


@pytest.mark.slow
def test_tpu_prover_device_msm_bit_exact(srs_1k):
    """Same differential as above but with msm_backend='device': the
    production grid-Pippenger commit path (digit extraction, bucket
    accumulation, window fold, affine conversion) must reproduce the spec
    proof byte-for-byte."""
    cs = _build_circuit()
    tr = TranscriptProtocol(b"test")
    pk, vk = rp.preprocess(cs, srs_1k, tr)

    proof_ref = rp.prove(cs, pk, srs_1k, tr.clone())

    dev_pk = tp.DevProverKey.from_ref(pk)
    dev_srs = tp.DevSRS(srs_1k)
    cfg = tp.ProverConfig(msm_backend="device", msm_window_bits=8)
    witness = tp.ProverWitness.from_composer(cs, pk.n)
    proof_tpu = tp.prove_tpu(witness, dev_pk, dev_srs, tr.clone(), cfg)

    _proofs_equal(proof_ref, proof_tpu)

    vtr = TranscriptProtocol(b"test")
    rp.seed_transcript(vtr, vk)
    assert verify(vk, srs_1k, proof_tpu, cs.public_inputs, vtr)


@pytest.mark.slow
def test_tpu_prover_lookup_circuit_bit_exact(srs_1k):
    cs = StandardComposer()
    cs.lookup_table.insert_multiple_xor(0, 4)
    a = cs.add_input(2)
    b = cs.add_input(3)
    c = cs.add_input(1)
    cs.lookup_gate(a, b, c)
    tr = TranscriptProtocol(b"lk")
    pk, vk = rp.preprocess(cs, srs_1k, tr)
    proof_ref = rp.prove(cs, pk, srs_1k, tr.clone())
    dev_pk = tp.DevProverKey.from_ref(pk)
    dev_srs = tp.DevSRS(srs_1k, device=False)
    cfg = tp.ProverConfig(msm_backend="host")
    witness = tp.ProverWitness.from_composer(cs, pk.n)
    proof_tpu = tp.prove_tpu(witness, dev_pk, dev_srs, tr.clone(), cfg)
    _proofs_equal(proof_ref, proof_tpu)
    vtr = TranscriptProtocol(b"lk")
    rp.seed_transcript(vtr, vk)
    assert verify(vk, srs_1k, proof_tpu, cs.public_inputs, vtr)


@pytest.mark.slow
def test_prove_many_batch(srs_1k):
    """prove_many: two different witnesses for the same circuit shape, both
    proofs verify."""
    from zprize_tpu.protocol.batch import prove_many
    from zprize_tpu.ref.verifier import verify as rverify

    def build(x, y):
        cs = StandardComposer()
        a = cs.add_input(x)
        b = cs.add_input(y)
        p = cs.mul(a, b)
        cs.arithmetic_gate(q_l=1, q_r=0, w_l=p, w_r=cs.zero_var, q_o=0,
                           w_o=cs.zero_var, pi=(-(x * y)) % R_MOD)
        return cs

    cs1 = build(6, 7)
    tr = TranscriptProtocol(b"batch")
    pk, vk = rp.preprocess(cs1, srs_1k, tr)
    dev_pk = tp.DevProverKey.from_ref(pk)
    dev_srs = tp.DevSRS(srs_1k, device=False)
    cfg = tp.ProverConfig(msm_backend="host")

    w1 = tp.ProverWitness.from_composer(cs1, pk.n)
    proofs, wall, pps = prove_many([w1, w1], dev_pk, dev_srs, tr, cfg)
    assert len(proofs) == 2
    for proof, w in zip(proofs, (w1, w1)):
        vtr = TranscriptProtocol(b"batch")
        rp.seed_transcript(vtr, vk)
        assert rverify(vk, srs_1k, proof, w.public_inputs, vtr)
