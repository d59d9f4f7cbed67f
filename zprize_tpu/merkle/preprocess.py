"""Device preprocessing for the Merkle layout: selector/sigma IFFTs and KZG
commitments straight from the tiled layout arrays — the counterpart of
`preprocess_shared`/`preprocess_prover`
(`plonk-core/src/proof_system/preprocess.rs:162-492`) with the O(n) work on
device (limbs-leading (L, n) arrays).

The reference's 8n coset tables (19 x 1 GiB at height 15) are NOT built:
the prover recomputes each sub-coset's evals on the fly from coefficient
form inside `_quotient_jit` (see `prover_tpu.DevProverKey`), so the prover
key is coefficient-only — 8x smaller than the reference's.

Phases are synced (a real D2H pull — block_until_ready does not drain the
axon runtime's queue) and logged so a mid-preprocess device fault is
attributable, and large intermediates are dropped as soon as their INTT
lands: at n=2^20 the un-synced version enqueued ~30 programs over an
~8 GiB live set and the TPU worker died mid-drain with no attribution."""

import sys
import time

import numpy as np
import jax.numpy as jnp

from ..params import R_MOD
from ..fields import mont
from ..fields.mont import FR, U32
from ..ops import ntt as jntt
from ..protocol.prover_tpu import (DevProverKey, DevSRS, ProverConfig,
                                   commit_batch, _intt_jit)
from ..ref.prover import VerifierKey, SELECTOR_ORDER, SIGMA_NAMES, \
    seed_transcript
from .layout import MerkleLayout

M = R_MOD


def _sync(label, arr, t0):
    """Force execution of everything queued so far (real D2H pull)."""
    np.asarray(arr).ravel()[:1]
    print(f"#   preprocess {label}: {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    return time.time()


def preprocess_layout(lay: MerkleLayout, dev_srs: DevSRS, transcript,
                      cfg: ProverConfig = None):
    """Returns (DevProverKey, VerifierKey); seeds the transcript."""
    cfg = cfg or ProverConfig()
    n = lay.n
    log_n = n.bit_length() - 1
    plan = jntt.get_plan(log_n).warm()

    pk = DevProverKey()
    pk.n = n
    pk.log_n = log_n

    # INTT the 15 selectors in batches of 5: one (L, 19, n) module at
    # n = 2^20 crashes the remote compile helper (round-4 finding), and
    # the (L, 5, n) shape is shared with round 1's wires+PI INTT. Each
    # batch's eval-form input is dropped before the next is built.
    t0 = time.time()
    sel_poly_chunks = []
    for s in range(0, len(SELECTOR_ORDER), 5):
        names = SELECTOR_ORDER[s:s + 5]
        chunk = [jnp.asarray(lay.selector_limbs[name]) for name in names]
        pad = 5 - len(chunk)
        if pad:
            chunk = chunk + [jnp.zeros_like(chunk[0])] * pad
        out = _intt_jit(plan, jnp.stack(chunk, axis=1))
        del chunk
        sel_poly_chunks.extend(out[:, i] for i in range(5 - pad))
        t0 = _sync(f"selector intt [{s}:{s + 5}]", out, t0)
        del out
    pk.sel_poly = {name: sel_poly_chunks[i]
                   for i, name in enumerate(SELECTOR_ORDER)}

    sigma_evals = lay.sigma_evals_device()
    t0 = _sync("sigma evals", sigma_evals[0], t0)
    pk.sigma_evals_n = sigma_evals
    sigma_polys = _intt_jit(plan, jnp.stack(
        sigma_evals + [jnp.zeros_like(sigma_evals[0])], axis=1))
    pk.sigma_poly = [sigma_polys[:, i] for i in range(4)]
    t0 = _sync("sigma intt", sigma_polys, t0)
    del sigma_polys

    # commit the 19 polys in small stacks so the commit programs never
    # coexist with a padded (L, 24, n) copy of everything (at n=2^20 that
    # copy alone is 1.6 GiB; the sync per call also bounds queue depth)
    all_polys = sel_poly_chunks + pk.sigma_poly
    comms = []
    for s in range(0, len(all_polys), 4):
        group = all_polys[s:s + 4]
        # commit_batch itself drains the queue (overflow-count pull)
        comms.extend(commit_batch(dev_srs, jnp.stack(group, axis=1), cfg))
        print(f"#   preprocess commit [{s}:{s + len(group)}]: "
              f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
        t0 = time.time()
    commitments = {}
    for i, name in enumerate(SELECTOR_ORDER):
        commitments[name] = comms[i]
    for i, name in enumerate(SIGMA_NAMES):
        commitments[name] = comms[len(SELECTOR_ORDER) + i]

    # empty lookup table -> 4 all-zero padded columns (MultiSet::pad);
    # q_lookup is identically zero in this circuit, so the lookup system is
    # degenerate (reference shortcut: gen_proof.cuh:107-115)
    zero_col = jnp.zeros((FR.L, n), dtype=U32)
    pk.table_cols = [zero_col] * 4
    pk.lookup_degenerate = bool(
        np.all(lay.selector_limbs["q_lookup"] == 0))
    table_commitments = [None] * 4

    vk = VerifierKey(n, {k: v for k, v in commitments.items()},
                     table_commitments)
    seed_transcript(transcript, vk)
    return pk, vk
