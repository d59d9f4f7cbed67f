"""ProverKey/VerifierKey persistence round-trip."""

import os

import numpy as np
import jax.numpy as jnp

from zprize_tpu.merkle.layout import MerkleLayout
from zprize_tpu.merkle.preprocess import preprocess_layout
from zprize_tpu.protocol import prover_tpu as tp
from zprize_tpu.protocol.keys_io import (save_prover_key, load_prover_key,
                                         save_verifier_key, load_verifier_key)
from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol
from zprize_tpu.ref.kzg import SRS


def test_keys_roundtrip(tmp_path, srs_1k):
    lay = MerkleLayout(3)
    dev_srs = tp.DevSRS(srs_1k, device=False)
    cfg = tp.ProverConfig(msm_backend="host")
    tr = TranscriptProtocol(b"io")
    pk, vk = preprocess_layout(lay, dev_srs, tr, cfg)

    pk_path = str(tmp_path / "pk.npz")
    vk_path = str(tmp_path / "vk.json")
    save_prover_key(pk, pk_path)
    save_verifier_key(vk, vk_path)

    pk2 = load_prover_key(pk_path)
    vk2 = load_verifier_key(vk_path)
    assert pk2.n == pk.n
    assert np.array_equal(np.asarray(pk2.sel_poly["q_m"]),
                          np.asarray(pk.sel_poly["q_m"]))
    assert np.array_equal(np.asarray(pk2.sigma_poly[3]),
                          np.asarray(pk.sigma_poly[3]))
    assert pk2.lookup_degenerate == pk.lookup_degenerate
    assert vk2.n == vk.n
    assert vk2.commitments == vk.commitments
    assert vk2.table_commitments == vk.table_commitments
