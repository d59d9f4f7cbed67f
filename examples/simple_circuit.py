"""Example: build, prove and verify a small PLONK circuit — counterpart of
the reference's `examples/simple_circuit.rs`.

Circuit: prove knowledge of a, b such that
  a + b = 25 (public), a * b = 100, a < 2^6, and e = k*J for the embedded
  curve generator J (fixed-base scalar mul), with e bound as a public point.

Run: /opt/venv/bin/python examples/simple_circuit.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from zprize_tpu.params import R_MOD
from zprize_tpu.circuit.composer import StandardComposer
import zprize_tpu.circuit.gates_ext  # noqa: F401  (gate library)
from zprize_tpu.curve import jubjub
from zprize_tpu.ref import prover as rp
from zprize_tpu.ref.kzg import SRS
from zprize_tpu.ref.verifier import verify
from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol


def gadget(cs: StandardComposer):
    a = cs.add_input(20)
    b = cs.add_input(5)
    # a + b == 25 as a public input
    cs.arithmetic_gate(q_l=1, q_r=1, w_l=a, w_r=b, q_o=0, w_o=cs.zero_var,
                       pi=(-25) % R_MOD)
    # a * b == 100 (circuit constant)
    e = cs.mul(a, b)
    cs.constrain_to_constant(e, 100)
    # range check
    cs.range_gate(a, 6)
    # embedded-curve fixed-base mul
    k = 67 * 5
    kv = cs.add_input(k)
    pt = cs.fixed_base_scalar_mul(kv)
    expected = jubjub.mul(jubjub.GENERATOR, k)
    cs.constrain_to_constant(pt.x, 0, pi=(-expected[0]) % R_MOD)
    cs.constrain_to_constant(pt.y, 0, pi=(-expected[1]) % R_MOD)


def main():
    cs = StandardComposer()
    gadget(cs)
    cs.check_circuit_satisfied()
    n = cs.circuit_bound()
    print(f"gates: {cs.n}, padded domain: {n}")

    print("setup (test SRS)...")
    srs = SRS.setup(n + 8, tau=0xC0FFEE)

    tr = TranscriptProtocol(b"simple_circuit")
    t0 = time.time()
    pk, vk = rp.preprocess(cs, srs, tr)
    print(f"preprocess: {time.time() - t0:.1f}s")

    t0 = time.time()
    proof = rp.prove(cs, pk, srs, tr)
    print(f"prove: {time.time() - t0:.1f}s")

    vtr = TranscriptProtocol(b"simple_circuit")
    rp.seed_transcript(vtr, vk)
    t0 = time.time()
    ok = verify(vk, srs, proof, cs.public_inputs, vtr)
    print(f"verify: {ok} ({time.time() - t0:.1f}s)")
    assert ok


if __name__ == "__main__":
    main()
