"""Device Pippenger MSM vs the Python oracle (small windows for CPU speed)."""

import random

import pytest

from zprize_tpu.ops import msm as jmsm
from zprize_tpu.ref.curve import G1_GEN, g1_mul, g1_msm
from zprize_tpu.params import R_MOD


@pytest.mark.slow
def test_msm_matches_oracle():
    rng = random.Random(5)
    n = 64
    pts = [g1_mul(G1_GEN, rng.randrange(1, 1000)) for _ in range(n)]
    pts[7] = None
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    scalars[3] = 0
    scalars[5] = 1
    assert jmsm.msm(pts, scalars, window_bits=4) == g1_msm(pts, scalars)


@pytest.mark.slow
def test_msm_zero_and_tiny():
    pts = [G1_GEN, g1_mul(G1_GEN, 2)]
    assert jmsm.msm(pts, [0, 0], window_bits=4) is None
    assert jmsm.msm(pts, [1, 0], window_bits=4) == G1_GEN
