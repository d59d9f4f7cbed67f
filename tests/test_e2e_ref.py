"""End-to-end prove+verify with the pure-Python executable spec.

These are the oracle tests every TPU-path change must keep green; the config
ladder mirrors BASELINE.json's configs (small arithmetic circuit, single
Poseidon gadget, small Merkle tree, lookup circuit)."""

import random

import pytest

from zprize_tpu.params import R_MOD
from zprize_tpu.circuit.composer import StandardComposer
from zprize_tpu.ref import prover as rp
from zprize_tpu.ref.verifier import verify
from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol


def _prove_and_verify(cs, srs, label=b"test", tamper=False):
    cs.check_circuit_satisfied()
    tr = TranscriptProtocol(label)
    pk, vk = rp.preprocess(cs, srs, tr)
    proof = rp.prove(cs, pk, srs, tr)
    if tamper:
        proof.evaluations.a_eval = (proof.evaluations.a_eval + 1) % R_MOD
    vtr = TranscriptProtocol(label)
    rp.seed_transcript(vtr, vk)
    return verify(vk, srs, proof, cs.public_inputs, vtr)


def test_simple_arith_circuit(srs_1k):
    cs = StandardComposer()
    a = cs.add_input(20)
    b = cs.add_input(5)
    cs.arithmetic_gate(q_l=1, q_r=1, w_l=a, w_r=b, q_o=0, w_o=cs.zero_var,
                       pi=(-25) % R_MOD)
    e = cs.mul(a, b)
    cs.constrain_to_constant(e, 100)
    cs.range_gate(a, 6)
    assert _prove_and_verify(cs, srs_1k)


def test_tampered_proof_rejected(srs_1k):
    cs = StandardComposer()
    a = cs.add_input(3)
    b = cs.add_input(4)
    cs.add(a, b)
    assert not _prove_and_verify(cs, srs_1k, tamper=True)


def test_boolean_and_poly_gates(srs_1k):
    cs = StandardComposer()
    one = cs.add_input(1)
    cs.boolean_gate(one)
    zero = cs.add_input(0)
    cs.boolean_gate(zero)
    c = cs.mul(one, one)
    cs.assert_equal(c, one)
    assert _prove_and_verify(cs, srs_1k)


@pytest.mark.slow
def test_poseidon_gadget_proof(srs_1k):
    from zprize_tpu.poseidon.constants import PoseidonConstants
    from zprize_tpu.poseidon.ref import hash2
    from zprize_tpu.poseidon.gadget import assert_hash_constraints
    param = PoseidonConstants.generate(3)
    cs = StandardComposer()
    l = cs.add_input(123)
    r = cs.add_input(456)
    o = cs.add_input(hash2(param, 123, 456))
    assert_hash_constraints(cs, param, l, r, o)
    assert cs.circuit_bound() <= 1 << 10
    assert _prove_and_verify(cs, srs_1k)


@pytest.mark.slow
def test_lookup_circuit(srs_1k):
    cs = StandardComposer()
    cs.lookup_table.insert_multiple_xor(0, 4)
    a = cs.add_input(2)
    b = cs.add_input(3)
    c = cs.add_input(1)
    cs.lookup_gate(a, b, c)
    a2 = cs.add_input(1)
    b2 = cs.add_input(1)
    c2 = cs.add_input(0)
    cs.lookup_gate(a2, b2, c2)
    assert _prove_and_verify(cs, srs_1k)
