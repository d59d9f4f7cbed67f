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

    sel_evals = jnp.stack(
        [jnp.asarray(lay.selector_limbs[name]) for name in SELECTOR_ORDER],
        axis=1)                                             # (L, 15, n)
    sel_polys = _intt_jit(plan, sel_evals)
    pk.sel_poly = {name: sel_polys[:, i]
                   for i, name in enumerate(SELECTOR_ORDER)}

    sigma_evals = lay.sigma_evals_device()
    pk.sigma_evals_n = sigma_evals
    sigma_polys = _intt_jit(plan, jnp.stack(sigma_evals, axis=1))
    pk.sigma_poly = [sigma_polys[:, i] for i in range(4)]

    all_polys = jnp.concatenate([sel_polys, sigma_polys], axis=1)
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
