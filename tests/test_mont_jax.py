"""JAX limbed-Montgomery field ops vs the Python-int oracle."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zprize_tpu.fields import mont
from zprize_tpu.fields.mont import FR, FQ
from zprize_tpu.params import R_MOD, Q_MOD

CASES = [(FR, R_MOD), (FQ, Q_MOD)]


@pytest.mark.parametrize("cfg,MOD", CASES, ids=["fr", "fq"])
def test_mul_add_sub_neg(cfg, MOD):
    rng = random.Random(1)
    xs = [rng.randrange(MOD) for _ in range(32)] + [0, 1, MOD - 1]
    ys = [rng.randrange(MOD) for _ in range(32)] + [MOD - 1, 0, MOD - 1]
    a = jnp.asarray(cfg.to_mont_host(xs))
    b = jnp.asarray(cfg.to_mont_host(ys))
    mul = jax.jit(lambda a, b: mont.mont_mul(cfg, a, b))
    assert cfg.from_mont_host(np.asarray(mul(a, b))) == \
        [x * y % MOD for x, y in zip(xs, ys)]
    assert cfg.from_mont_host(np.asarray(jax.jit(
        lambda a, b: mont.add(cfg, a, b))(a, b))) == \
        [(x + y) % MOD for x, y in zip(xs, ys)]
    assert cfg.from_mont_host(np.asarray(jax.jit(
        lambda a, b: mont.sub(cfg, a, b))(a, b))) == \
        [(x - y) % MOD for x, y in zip(xs, ys)]
    assert cfg.from_mont_host(np.asarray(jax.jit(
        lambda a: mont.neg(cfg, a))(a))) == [(-x) % MOD for x in xs]


@pytest.mark.parametrize("cfg,MOD", CASES, ids=["fr", "fq"])
def test_inv_and_batch_inv(cfg, MOD):
    rng = random.Random(2)
    xs = [rng.randrange(1, MOD) for _ in range(8)]
    a = jnp.asarray(cfg.to_mont_host(xs))
    # inv/batch_inv are NOT jit-safe by design (host round-trip for the
    # single total-product inversion) — call eagerly
    iv = cfg.from_mont_host(np.asarray(mont.inv(cfg, a)))
    assert iv == [pow(x, -1, MOD) for x in xs]
    xs2 = list(xs)
    xs2[3] = 0
    a2 = jnp.asarray(cfg.to_mont_host(xs2))
    bi = cfg.from_mont_host(np.asarray(mont.batch_inv(cfg, a2)))
    assert bi == [pow(x, -1, MOD) if x else 0 for x in xs2]


@pytest.mark.parametrize("cfg,MOD", CASES, ids=["fr", "fq"])
def test_to_from_mont(cfg, MOD):
    rng = random.Random(3)
    xs = [rng.randrange(MOD) for _ in range(16)]
    raw = jnp.asarray(cfg.raw_to_limbs_host(xs))
    m = jax.jit(lambda r: mont.to_mont(cfg, r))(raw)
    assert np.array_equal(np.asarray(m), cfg.to_mont_host(xs))
    back = jax.jit(lambda m: mont.from_mont(cfg, m))(m)
    assert np.array_equal(np.asarray(back), raw)
