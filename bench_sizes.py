"""Criterion-style size sweep (counterpart of the reference's
`benches/plonk.rs`: prove times across circuit sizes): dummy arithmetic
circuits at 2^k gates through the executable-spec prover on CPU.

Run: /opt/venv/bin/python bench_sizes.py [min_log] [max_log]
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

from zprize_tpu.params import R_MOD
from zprize_tpu.circuit.composer import StandardComposer
from zprize_tpu.ref import prover as rp
from zprize_tpu.ref.kzg import SRS
from zprize_tpu.ref.verifier import verify
from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol


def dummy_circuit(log_gates):
    """Chain of add/mul gates (the reference's `dummy_gadget` shape)."""
    cs = StandardComposer()
    a = cs.add_input(3)
    b = cs.add_input(5)
    while cs.n < (1 << log_gates) - 2:
        a = cs.add(a, b)
        b = cs.mul(a, b)
    return cs

def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    srs = SRS.setup((1 << hi) + 8, tau=0xABCD)
    print("| log2 gates | n | preprocess s | prove s | verify |")
    print("|---|---|---|---|---|")
    for k in range(lo, hi + 1):
        cs = dummy_circuit(k)
        n = cs.circuit_bound()
        tr = TranscriptProtocol(b"sweep")
        t0 = time.time()
        pk, vk = rp.preprocess(cs, srs, tr)
        pre_s = time.time() - t0
        t0 = time.time()
        proof = rp.prove(cs, pk, srs, tr)
        prove_s = time.time() - t0
        vtr = TranscriptProtocol(b"sweep")
        rp.seed_transcript(vtr, vk)
        ok = verify(vk, srs, proof, cs.public_inputs, vtr)
        print(f"| {k} | {n} | {pre_s:.2f} | {prove_s:.2f} | "
              f"{'PASS' if ok else 'FAIL'} |", flush=True)
        assert ok


if __name__ == "__main__":
    main()
