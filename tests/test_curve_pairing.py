import pytest

from zprize_tpu.params import R_MOD
from zprize_tpu.ref.curve import (G1_GEN, G2_GEN, g1_mul, g2_mul, g1_add,
                                  g1_msm, g1_is_on_curve, g2_is_on_curve)
from zprize_tpu.ref.pairing import pairing, pairing_product_is_one


def test_generators_on_curve():
    assert g1_is_on_curve(G1_GEN)
    assert g2_is_on_curve(G2_GEN)


def test_subgroup_order():
    assert g1_mul(G1_GEN, R_MOD) is None
    assert g2_mul(G2_GEN, R_MOD) is None


def test_msm_matches_naive():
    pts = [g1_mul(G1_GEN, i + 1) for i in range(50)]
    scalars = [(i * 977 + 31) % R_MOD for i in range(50)]
    expected = None
    for p, s in zip(pts, scalars):
        expected = g1_add(expected, g1_mul(p, s))
    assert g1_msm(pts, scalars) == expected


@pytest.mark.slow
def test_pairing_bilinearity():
    e = pairing(G1_GEN, G2_GEN)
    a, b = 777, 1234567
    assert pairing(g1_mul(G1_GEN, a), g2_mul(G2_GEN, b)) == e.pow(a * b)


def test_pairing_product():
    a = 424242
    assert pairing_product_is_one([
        (g1_mul(G1_GEN, a), G2_GEN),
        (g1_mul(G1_GEN, (-a) % R_MOD), G2_GEN),
    ])
