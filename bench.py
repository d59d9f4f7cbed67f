"""End-to-end gen_proof benchmark on the real TPU chip.

Workload: PLONK proof for a height-H Poseidon Merkle tree (the reference's
official zprize_bench workload at H=15; BENCH_HEIGHT scales it down while the
single-chip MSM is being optimized — the vs_baseline figure scales the
reference's 9.3 s by circuit size, see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

BASELINE_GEN_PROOF_S = 9.3      # reference README (RTX 6000 Ada), height 15
BASELINE_LOG_N = 22             # proving domain at height 15


def main():
    height = int(os.environ.get("BENCH_HEIGHT", "6"))
    window_bits = int(os.environ.get("BENCH_WINDOW_BITS", "8"))
    verify_proof = os.environ.get("BENCH_VERIFY", "1") == "1"

    from zprize_tpu.params import R_MOD
    from zprize_tpu.merkle.layout import MerkleLayout
    from zprize_tpu.merkle.preprocess import preprocess_layout
    from zprize_tpu.protocol import prover_tpu as tp
    from zprize_tpu.protocol.srs import device_srs
    from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol
    from zprize_tpu.fields.mont import FR

    t_all = time.time()
    lay = MerkleLayout(height)
    n = lay.n
    print(f"# height={height} gates={lay.n_real} n=2^{n.bit_length()-1}",
          file=sys.stderr)

    t0 = time.time()
    pts, srs_lite, tau = device_srs(n + 8)
    print(f"# srs: {time.time()-t0:.1f}s", file=sys.stderr)

    dev_srs = tp.DevSRS.__new__(tp.DevSRS)
    dev_srs.points = pts
    dev_srs.ref = srs_lite
    dev_srs.size = n + 9

    cfg = tp.ProverConfig(msm_backend="device", msm_window_bits=window_bits)

    t0 = time.time()
    tr = TranscriptProtocol(b"Merkle tree")
    dev_pk, vk = preprocess_layout(lay, dev_srs, tr, cfg)
    print(f"# preprocess: {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    leaves_ints = [int.from_bytes(rng.bytes(31), "little")
                   for _ in range(lay.m_leaves)]
    leaves_dev = jnp.asarray(FR.to_mont_host(leaves_ints))

    # warm-up pass: populates the (persistent) compilation cache, exactly
    # like the reference excludes pk-clone/setup from its scored time
    if os.environ.get("BENCH_WARMUP", "1") == "1":
        t0 = time.time()
        wires, root_val, _ = lay.witness(leaves_dev)
        w = tp.ProverWitness(wires, {lay.root_gate_pos: (-root_val) % R_MOD},
                             jnp.ones((n,), dtype=bool))
        tp.prove_tpu(w, dev_pk, dev_srs, tr.clone(), cfg)
        print(f"# warmup (incl compiles): {time.time()-t0:.1f}s",
              file=sys.stderr)

    # ---- the timed section: witness synthesis + gen_proof (the
    # reference's "gadget" + "gen_proof" rows) ----
    t0 = time.time()
    wires, root_val, _ = lay.witness(leaves_dev)
    jax.block_until_ready(wires[0])
    witness_s = time.time() - t0

    witness = tp.ProverWitness(
        wires, {lay.root_gate_pos: (-root_val) % R_MOD},
        jnp.ones((n,), dtype=bool))

    t0 = time.time()
    proof = tp.prove_tpu(witness, dev_pk, dev_srs, tr, cfg)
    prove_s = time.time() - t0
    gen_proof_s = witness_s + prove_s
    print(f"# witness: {witness_s:.2f}s  prove: {prove_s:.2f}s "
          f"(total incl setup {time.time()-t_all:.1f}s)", file=sys.stderr)

    if verify_proof:
        from zprize_tpu.ref.verifier import verify
        from zprize_tpu.ref.prover import seed_transcript
        vtr = TranscriptProtocol(b"Merkle tree")
        seed_transcript(vtr, vk)
        ok = verify(vk, srs_lite, proof, witness.public_inputs, vtr)
        print(f"# verify: {'PASS' if ok else 'FAIL'}", file=sys.stderr)
        if not ok:
            print(json.dumps({"metric": f"gen_proof_height{height}",
                              "value": -1, "unit": "s", "vs_baseline": 0}))
            sys.exit(1)

    # reference-style summary table (zprize_bench.rs four-column shape)
    print("# | stage            | seconds |", file=sys.stderr)
    print(f"# | gadget (witness) | {witness_s:7.2f} |", file=sys.stderr)
    print(f"# | gen_proof        | {prove_s:7.2f} |", file=sys.stderr)
    print(f"# | total            | {gen_proof_s:7.2f} |", file=sys.stderr)

    # scale the reference's height-15 number by circuit size for smaller runs
    scaled_baseline = BASELINE_GEN_PROOF_S * n / (1 << BASELINE_LOG_N)
    print(json.dumps({
        "metric": f"gen_proof seconds (height-{height} Poseidon tree)",
        "value": round(gen_proof_s, 3),
        "unit": "s",
        "vs_baseline": round(scaled_baseline / gen_proof_s, 4),
    }))


if __name__ == "__main__":
    main()
