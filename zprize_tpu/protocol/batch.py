"""Batch proving API — the data-parallel surface (proofs/s).

The reference proves strictly sequentially (`pnp_bench.rs:67` REPEAT loop).
Here `prove_many` is the API point where whole-proof data parallelism lands:
today it runs sequentially on the local chip; the mesh path (one proof per
chip / per host via jax.sharding device placement) plugs in here in round 2.
"""

import time


def prove_many(witnesses, dev_pk, dev_srs, base_transcript, cfg=None):
    """Prove a batch of witnesses against one preprocessed circuit.
    Returns (proofs, wall_seconds, proofs_per_second)."""
    from .prover_tpu import prove_tpu
    proofs = []
    t0 = time.time()
    for w in witnesses:
        proofs.append(prove_tpu(w, dev_pk, dev_srs,
                                base_transcript.clone(), cfg))
    wall = time.time() - t0
    return proofs, wall, len(witnesses) / wall if wall > 0 else float("inf")
