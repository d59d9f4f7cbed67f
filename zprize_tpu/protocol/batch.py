"""Batch proving — the whole-proof data-parallel surface (proofs/s).

The reference proves strictly sequentially (`pnp_bench.rs:67` REPEAT loop);
data parallelism is this framework's TPU-native addition (SURVEY.md §2.3).

`prove_many(..., devices=[...])` places one proof per device: the prover
key, SRS and per-proof witness are replicated onto each device once, and
proofs run in Python threads (one per device). JAX dispatch is async and
releases the GIL while blocked on device results, so the devices' round
programs execute concurrently; the host serializes only the tiny O(1)
Fiat-Shamir/transcript work per proof. Outputs are byte-identical to
sequential proving (same transcript, same programs — only placement
differs).
"""

import copy
import time
from concurrent.futures import ThreadPoolExecutor

import jax


def _replicate(tree, device):
    """device_put every array leaf of a pytree onto `device` (no-op for
    leaves already there)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, device) if isinstance(x, jax.Array)
        else x, tree)


def prove_many(witnesses, dev_pk, dev_srs, base_transcript, cfg=None,
               devices=None):
    """Prove a batch of witnesses against one preprocessed circuit.

    devices: optional list of `jax.Device`. When given, proof i runs on
    devices[i % len(devices)] with its own replica of pk/SRS — whole-proof
    data parallelism. When None, proofs run sequentially on the default
    device (the reference's REPEAT-loop behavior).

    Returns (proofs, wall_seconds, proofs_per_second)."""
    from .prover_tpu import prove_tpu, ProverConfig, DevSRS

    proofs = [None] * len(witnesses)
    t0 = time.time()

    if not devices:
        for i, w in enumerate(witnesses):
            proofs[i] = prove_tpu(w, dev_pk, dev_srs,
                                  base_transcript.clone(), cfg)
    else:
        cfg = cfg or ProverConfig()
        assert cfg.mesh is None, "DP over devices excludes a sharding mesh"
        # one pk/SRS replica per device (the DP memory trade; the reference
        # clones its pk per proof on the host for the same reason)
        pks, srss = [], []
        for d in devices:
            pks.append(_replicate(dev_pk, d))
            srss.append(dev_srs.replicate(d))

        def run(i):
            k = i % len(devices)
            d = devices[k]
            w = witnesses[i].replicate(d)
            # shallow-copy the caller's cfg so EVERY field (incl. ones
            # added later) propagates; only placement is overridden
            dcfg = copy.copy(cfg)
            dcfg.device = d
            dcfg.mesh = None
            # thread-local default device: challenge scalars created inside
            # prove_tpu land next to the proof's arrays
            with jax.default_device(d):
                proofs[i] = prove_tpu(w, pks[k], srss[k],
                                      base_transcript.clone(), dcfg)

        with ThreadPoolExecutor(max_workers=len(devices)) as ex:
            list(ex.map(run, range(len(witnesses))))

    wall = time.time() - t0
    return proofs, wall, len(witnesses) / wall if wall > 0 else float("inf")
