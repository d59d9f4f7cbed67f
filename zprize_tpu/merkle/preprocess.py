"""Device preprocessing for the Merkle layout: selector/sigma IFFTs, 8n coset
evals, and KZG commitments straight from the tiled layout arrays — the
counterpart of `preprocess_shared`/`preprocess_prover`
(`plonk-core/src/proof_system/preprocess.rs:162-492`) with the O(n) work on
device (limbs-leading (L, n) arrays)."""

import numpy as np
import jax.numpy as jnp

from ..params import R_MOD, FR_GENERATOR
from ..fields import mont
from ..fields.mont import FR, U32
from ..ops import ntt as jntt
from ..protocol.prover_tpu import DevProverKey, DevSRS, ProverConfig, commit
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
    plan = jntt.get_plan(log_n)
    plan8 = jntt.get_plan(log_n + 3)

    pk = DevProverKey()
    pk.n = n
    pk.log_n = log_n

    pk.sel_poly = {}
    for name in SELECTOR_ORDER:
        evals = jnp.asarray(lay.selector_limbs[name])
        pk.sel_poly[name] = jntt.intt(plan, evals)

    sigma_evals = lay.sigma_evals_device()
    pk.sigma_evals_n = sigma_evals
    pk.sigma_poly = [jntt.intt(plan, e) for e in sigma_evals]

    commitments = {}
    for name in SELECTOR_ORDER:
        commitments[name] = commit(dev_srs, pk.sel_poly[name], cfg)
    for name, poly in zip(SIGMA_NAMES, pk.sigma_poly):
        commitments[name] = commit(dev_srs, poly, cfg)

    def lift8(p):
        return jnp.concatenate(
            [p, jnp.zeros((FR.L, 8 * n - p.shape[1]), dtype=U32)], axis=1)

    pk.sel_8n = {name: jntt.coset_ntt(plan8, lift8(pk.sel_poly[name]))
                 for name in SELECTOR_ORDER}
    pk.sigma_8n = [jntt.coset_ntt(plan8, lift8(p)) for p in pk.sigma_poly]
    pk.linear_8n = jntt.coset_ntt(plan8, lift8(
        jnp.asarray(FR.to_mont_host([0, 1]))))

    g_n = pow(FR_GENERATOR, n, M)
    w_n = pow(plan8.omega, n, M)
    vh = []
    acc = g_n
    for _ in range(8):
        vh.append((acc - 1) % M)
        acc = acc * w_n % M
    vh_inv = [pow(v, -1, M) for v in vh]
    pk.v_h_inv_8n = jnp.tile(jnp.asarray(FR.to_mont_host(vh_inv)), (1, n))

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
