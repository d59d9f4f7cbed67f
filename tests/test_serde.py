"""Proof byte serialization (arkworks layout): round-trip + verify."""

import pytest

from zprize_tpu.params import R_MOD
from zprize_tpu.circuit.composer import StandardComposer
from zprize_tpu.ref import prover as rp
from zprize_tpu.ref.verifier import verify
from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol
from zprize_tpu.protocol.serde import serialize_proof, deserialize_proof


@pytest.mark.slow
def test_proof_serde_roundtrip_and_verify(srs_1k):
    cs = StandardComposer()
    a = cs.add_input(6)
    b = cs.add_input(7)
    c = cs.mul(a, b)
    cs.constrain_to_constant(c, 42)
    tr = TranscriptProtocol(b"serde")
    pk, vk = rp.preprocess(cs, srs_1k, tr)
    proof = rp.prove(cs, pk, srs_1k, tr)

    blob = serialize_proof(proof)
    proof2 = deserialize_proof(blob)
    assert proof2.a_comm == proof.a_comm
    assert proof2.t_comms == proof.t_comms
    assert proof2.aw_opening == proof.aw_opening
    assert proof2.evaluations == proof.evaluations
    assert serialize_proof(proof2) == blob

    vtr = TranscriptProtocol(b"serde")
    rp.seed_transcript(vtr, vk)
    assert verify(vk, srs_1k, proof2, cs.public_inputs, vtr)
