"""Example: Poseidon Merkle-tree proof end-to-end — counterpart of the
reference's `merkle-tree/src/main.rs` (single proof + verification), at a
small height so the pure-CPU run finishes in ~a minute.

Run: /opt/venv/bin/python examples/merkle_tree.py [height]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from zprize_tpu.params import R_MOD
from zprize_tpu.poseidon.constants import PoseidonConstants
from zprize_tpu.merkle.tree import MerkleTree
from zprize_tpu.merkle.layout import MerkleLayout
from zprize_tpu.merkle.preprocess import preprocess_layout
from zprize_tpu.protocol import prover_tpu as tp
from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol
from zprize_tpu.protocol.serde import serialize_proof
from zprize_tpu.ref.kzg import SRS
from zprize_tpu.ref import prover as rp
from zprize_tpu.ref.verifier import verify
from zprize_tpu.fields.mont import FR


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    height = int(args[0]) if args else 3
    rng = random.Random(42)
    param = PoseidonConstants.generate(3)
    leaves = [rng.randrange(R_MOD) for _ in range(1 << (height - 1))]

    t0 = time.time()
    tree = MerkleTree(param, leaves, height)
    print(f"tree built, root={hex(tree.root())[:18]}… "
          f"({time.time()-t0:.2f}s)")

    lay = MerkleLayout(height)
    print(f"circuit: {lay.n_real} gates, domain 2^{lay.n.bit_length()-1}")

    print("setup (test SRS)…")
    srs = SRS.setup(lay.n + 8, tau=0xBEEF)

    use_layout = "--layout" in sys.argv  # device/array path (JIT-heavy on
    # CPU; the default spec path has predictable pure-Python timing)
    tr = TranscriptProtocol(b"Merkle tree")
    if use_layout:
        dev_srs = tp.DevSRS(srs, device=False)
        cfg = tp.ProverConfig(msm_backend="host")
        t0 = time.time()
        dev_pk, vk = preprocess_layout(lay, dev_srs, tr, cfg)
        print(f"preprocess: {time.time()-t0:.1f}s")
        t0 = time.time()
        wires, root_val, _ = lay.witness(
            jnp.asarray(FR.to_mont_host(leaves)))
        witness = tp.ProverWitness(
            wires, {lay.root_gate_pos: (-root_val) % R_MOD},
            jnp.ones((lay.n,), dtype=bool))
        proof = tp.prove_tpu(witness, dev_pk, dev_srs, tr, cfg)
        public_inputs = witness.public_inputs
    else:
        from zprize_tpu.merkle.circuit import gen_constraints
        from zprize_tpu.circuit.composer import StandardComposer
        cs = StandardComposer()
        gen_constraints(tree, cs, param)
        cs.check_circuit_satisfied()
        t0 = time.time()
        pk, vk = rp.preprocess(cs, srs, tr)
        print(f"preprocess: {time.time()-t0:.1f}s")
        t0 = time.time()
        proof = rp.prove(cs, pk, srs, tr)
        public_inputs = cs.public_inputs
    print(f"prove: {time.time()-t0:.1f}s "
          f"({len(serialize_proof(proof))} proof bytes)")

    vtr = TranscriptProtocol(b"Merkle tree")
    rp.seed_transcript(vtr, vk)
    t0 = time.time()
    ok = verify(vk, srs, proof, public_inputs, vtr)
    print(f"verify: {ok} ({time.time()-t0:.1f}s)")
    assert ok

    # membership proofs (path.rs parity)
    for idx in (0, (1 << (height - 1)) - 1):
        path = tree.gen_proof(idx)
        assert path.verify(param, tree.root())
    print("membership paths verify")


if __name__ == "__main__":
    main()
