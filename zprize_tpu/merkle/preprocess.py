"""Device preprocessing for the Merkle layout: selector/sigma IFFTs and KZG
commitments straight from the tiled layout arrays — the counterpart of
`preprocess_shared`/`preprocess_prover`
(`plonk-core/src/proof_system/preprocess.rs:162-492`) with the O(n) work on
device (limbs-leading (L, n) arrays).

The reference's 8n coset tables (19 x 1 GiB at height 15) are NOT built:
the prover recomputes each sub-coset's evals on the fly from coefficient
form inside `_quotient_jit` (see `prover_tpu.DevProverKey`), so the prover
key is coefficient-only — 8x smaller than the reference's."""

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
    # the (L, 5, n) shape is shared with round 1's wires+PI INTT.
    sel_cols = [jnp.asarray(lay.selector_limbs[name])
                for name in SELECTOR_ORDER]
    sel_poly_chunks = []
    for s in range(0, len(sel_cols), 5):
        chunk = sel_cols[s:s + 5]
        pad = 5 - len(chunk)
        if pad:
            chunk = chunk + [jnp.zeros_like(chunk[0])] * pad
        out = _intt_jit(plan, jnp.stack(chunk, axis=1))
        sel_poly_chunks.extend(out[:, i] for i in range(5 - pad))
    pk.sel_poly = {name: sel_poly_chunks[i]
                   for i, name in enumerate(SELECTOR_ORDER)}

    sigma_evals = lay.sigma_evals_device()
    pk.sigma_evals_n = sigma_evals
    sigma_polys = _intt_jit(plan, jnp.stack(
        sigma_evals + [jnp.zeros_like(sigma_evals[0])], axis=1))
    pk.sigma_poly = [sigma_polys[:, i] for i in range(4)]

    all_polys = jnp.stack(sel_poly_chunks + pk.sigma_poly, axis=1)
    comms = commit_batch(dev_srs, all_polys, cfg)
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
