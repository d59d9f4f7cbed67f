"""zprize_tpu — a TPU-native PLONK prover for BLS12-381 built from scratch.

Capability target: PNP-team/ZPrize23-gpu-submission (ZPrize 2023 Prize 1B) —
end-to-end PLONK proof generation for a height-15 Poseidon Merkle-tree circuit
over BLS12-381 with KZG (SonicKZG10-style) commitments.

Layer map (TPU-native redesign of the reference's Rust+CUDA sandwich):

  circuit/   — StandardComposer-compatible circuit frontend (ref: plonk-core
               constraint_system/*), vectorized witness synthesis.
  poseidon/  — Poseidon constants + native hash + gadget (ref: plonk-hashing).
  merkle/    — Merkle-tree workload (ref: merkle-tree/*).
  fields/    — limbed Montgomery Fr/Fq arithmetic as vectorized JAX ops
               (ref: lib/PLONK/utils/mont/*).
  ops/       — NTT/INTT/coset NTT, scans, poly ops, MSM (ref: sppark NTT/MSM,
               lib/PLONK/utils/*).
  curve/     — G1 point arithmetic in limbed coordinates (ref: ec/*).
  transcript/— bit-exact merlin/Strobe128 Fiat-Shamir + arkworks-compatible
               serialization (ref: lib/PLONK/src/transcript.cuh).
  protocol/  — the 5-round prover pipeline, preprocessing, KZG, verifier
               (ref: plonk-core/src/proof_system/*, lib/PLONK/src/*).
  ref/       — pure-Python executable spec (the oracle role the Rust CPU
               prover plays in the reference).
  parallel/  — jax.sharding mesh plans for multi-chip NTT/MSM.
"""

__version__ = "0.1.0"
