"""IPA polynomial commitment (transparent-setup alternative to KZG)."""

import random

from zprize_tpu.ref import ipa
from zprize_tpu.ref.domain import poly_eval
from zprize_tpu.params import R_MOD


def test_ipa_commit_open_check():
    rng = random.Random(1)
    params = ipa.IpaParams(32)
    coeffs = [rng.randrange(R_MOD) for _ in range(20)]  # shorter than n
    commitment = ipa.commit(params, coeffs)
    z = rng.randrange(R_MOD)
    v, proof = ipa.open_proof(params, coeffs, z)
    assert v == poly_eval(coeffs, z)
    assert len(proof["L"]) == 5  # log2(32) rounds
    assert ipa.check(params, commitment, z, v, proof)
    assert not ipa.check(params, commitment, z, (v + 1) % R_MOD, proof)
    assert not ipa.check(params, commitment, (z + 1) % R_MOD, v, proof)
    bad = dict(proof)
    bad["a"] = (proof["a"] + 1) % R_MOD
    assert not ipa.check(params, commitment, z, v, bad)
