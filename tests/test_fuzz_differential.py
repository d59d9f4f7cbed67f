"""Randomized differential testing: random circuits through both provers.

Each case builds a random mix of gate types, checks satisfiability, proves
with the executable spec AND the TPU pipeline (host MSM), asserts
byte-identical proofs, and verifies under the pairing checks."""

import random

import pytest

import zprize_tpu.circuit.gates_ext  # noqa: F401
from zprize_tpu.params import R_MOD
from zprize_tpu.circuit.composer import StandardComposer
from zprize_tpu.ref import prover as rp
from zprize_tpu.ref.verifier import verify
from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol
from zprize_tpu.protocol import prover_tpu as tp


def _random_circuit(seed):
    rng = random.Random(seed)
    cs = StandardComposer()
    vars_pool = [cs.add_input(rng.randrange(R_MOD)) for _ in range(4)]
    small_pool = [cs.add_input(rng.randrange(16)) for _ in range(2)]
    for _ in range(rng.randrange(4, 10)):
        op = rng.randrange(6)
        if op == 0:
            vars_pool.append(cs.add(rng.choice(vars_pool),
                                    rng.choice(vars_pool)))
        elif op == 1:
            vars_pool.append(cs.mul(rng.choice(vars_pool),
                                    rng.choice(vars_pool)))
        elif op == 2:
            v = rng.choice(small_pool)
            cs.range_gate(v, 8)
        elif op == 3:
            a, b = rng.choice(small_pool), rng.choice(small_pool)
            small_pool.append(cs.xor_gate(a, b, 8))
        elif op == 4:
            bit = cs.add_input(rng.randrange(2))
            cs.boolean_gate(bit)
            vars_pool.append(cs.conditional_select(
                bit, rng.choice(vars_pool), rng.choice(vars_pool)))
        else:
            v = rng.choice(vars_pool)
            val = cs.variables[v]
            cs.arithmetic_gate(q_l=1, q_r=0, w_l=v, w_r=cs.zero_var,
                               q_o=0, w_o=cs.zero_var, pi=(-val) % R_MOD)
    return cs


@pytest.mark.slow
@pytest.mark.parametrize("seed", [101, 202, 303])
def test_fuzz_spec_vs_tpu(srs_1k, seed):
    cs = _random_circuit(seed)
    cs.check_circuit_satisfied()
    assert cs.circuit_bound() <= 1 << 10, "keep fuzz circuits small"
    label = b"fuzz"
    tr = TranscriptProtocol(label)
    pk, vk = rp.preprocess(cs, srs_1k, tr)
    proof_ref = rp.prove(cs, pk, srs_1k, tr.clone())

    dev_pk = tp.DevProverKey.from_ref(pk)
    dev_srs = tp.DevSRS(srs_1k, device=False)
    cfg = tp.ProverConfig(msm_backend="host")
    witness = tp.ProverWitness.from_composer(cs, pk.n)
    proof_tpu = tp.prove_tpu(witness, dev_pk, dev_srs, tr.clone(), cfg)

    assert proof_tpu.evaluations == proof_ref.evaluations
    assert proof_tpu.t_comms == proof_ref.t_comms
    assert proof_tpu.aw_opening == proof_ref.aw_opening
    assert proof_tpu.saw_opening == proof_ref.saw_opening

    vtr = TranscriptProtocol(label)
    rp.seed_transcript(vtr, vk)
    assert verify(vk, srs_1k, proof_tpu, cs.public_inputs, vtr)
