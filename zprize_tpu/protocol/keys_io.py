"""Prover/verifier key persistence (checkpoint/resume aux subsystem).

The reference has no checkpointing and re-clones the 11 s ProverKey per proof
(`pnp_bench.rs:69-73`, SURVEY.md §5); here keys serialize to a compressed npz
(device limb arrays) + JSON (commitment ints) so a proving service loads them
once per circuit.
"""

import json
import os

import numpy as np
import jax.numpy as jnp

from .prover_tpu import DevProverKey
from ..ref.prover import VerifierKey, SELECTOR_ORDER, SIGMA_NAMES


def save_prover_key(pk: DevProverKey, path: str):
    arrays = {"n": np.asarray([pk.n])}
    for k, v in pk.sel_poly.items():
        arrays[f"sp_{k}"] = np.asarray(v)
    for i, v in enumerate(pk.sigma_poly):
        arrays[f"sigp_{i}"] = np.asarray(v)
    for i, v in enumerate(pk.sigma_evals_n):
        arrays[f"sige_{i}"] = np.asarray(v)
    for i, v in enumerate(pk.table_cols):
        arrays[f"tbl_{i}"] = np.asarray(v)
    # atomic: a death mid-save must not leave a half-written pk that the
    # scored bench then trusts (round-3 failure mode: empty cache dir)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load_prover_key(path: str) -> DevProverKey:
    z = np.load(path)
    pk = DevProverKey()
    pk.n = int(z["n"][0])
    pk.log_n = pk.n.bit_length() - 1
    pk.sel_poly = {k: jnp.asarray(z[f"sp_{k}"]) for k in SELECTOR_ORDER}
    pk.sigma_poly = [jnp.asarray(z[f"sigp_{i}"]) for i in range(4)]
    pk.sigma_evals_n = [jnp.asarray(z[f"sige_{i}"]) for i in range(4)]
    pk.table_cols = [jnp.asarray(z[f"tbl_{i}"]) for i in range(4)]
    pk.lookup_degenerate = bool(
        not np.any(z["sp_q_lookup"])
        and all(not np.any(z[f"tbl_{i}"]) for i in range(4)))
    return pk


def _pt(p):
    return None if p is None else [str(p[0]), str(p[1])]


def _unpt(v):
    return None if v is None else (int(v[0]), int(v[1]))


def save_verifier_key(vk: VerifierKey, path: str):
    data = {
        "n": vk.n,
        "commitments": {k: _pt(v) for k, v in vk.commitments.items()},
        "table_commitments": [_pt(v) for v in vk.table_commitments],
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f)
    os.replace(tmp, path)


def load_verifier_key(path: str) -> VerifierKey:
    with open(path) as f:
        data = json.load(f)
    return VerifierKey(
        data["n"],
        {k: _unpt(v) for k, v in data["commitments"].items()},
        [_unpt(v) for v in data["table_commitments"]])
