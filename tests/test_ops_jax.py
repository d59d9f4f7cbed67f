"""Device NTT / poly ops vs the pure-Python oracle."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zprize_tpu.params import R_MOD
from zprize_tpu.fields import mont
from zprize_tpu.fields.mont import FR
from zprize_tpu.ops import ntt as jntt
from zprize_tpu.ops import poly as jpoly
from zprize_tpu.ref.domain import Domain, poly_eval, poly_divide_linear

LOG_N = 8
N = 1 << LOG_N


def _rand(n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(R_MOD) for _ in range(n)]


@pytest.fixture(scope="module")
def plan():
    return jntt.get_plan(LOG_N)


def test_ntt_matches_oracle(plan):
    xs = _rand(N)
    d = Domain(N)
    a = jnp.asarray(FR.to_mont_host(xs))
    out = FR.from_mont_host(np.asarray(jax.jit(
        lambda a: jntt.ntt(plan, a))(a)))
    assert out == d.fft(xs)


def test_intt_roundtrip_and_oracle(plan):
    xs = _rand(N, 1)
    d = Domain(N)
    a = jnp.asarray(FR.to_mont_host(xs))
    iout = FR.from_mont_host(np.asarray(jax.jit(
        lambda a: jntt.intt(plan, a))(a)))
    assert iout == d.ifft(xs)
    rt = jax.jit(lambda a: jntt.intt(plan, jntt.ntt(plan, a)))(a)
    assert FR.from_mont_host(np.asarray(rt)) == xs


def test_coset_ntt(plan):
    xs = _rand(N, 2)
    d = Domain(N)
    a = jnp.asarray(FR.to_mont_host(xs))
    out = FR.from_mont_host(np.asarray(jax.jit(
        lambda a: jntt.coset_ntt(plan, a))(a)))
    assert out == d.coset_fft(xs)
    back = FR.from_mont_host(np.asarray(jax.jit(
        lambda a: jntt.coset_intt(plan, a))(jnp.asarray(
            FR.to_mont_host(d.coset_fft(xs))))))
    assert back == xs


def test_powers_and_eval(plan):
    xs = _rand(64, 3)
    x = 987654321
    xm = jnp.asarray(FR.to_mont_host([x]))[:, 0]
    pows = jax.jit(lambda x: jpoly.powers(FR, x, 64))(xm)
    assert FR.from_mont_host(np.asarray(pows)) == \
        [pow(x, i, R_MOD) for i in range(64)]
    c = jnp.asarray(FR.to_mont_host(xs))
    ev = jax.jit(lambda c, p: jpoly.poly_eval(FR, c, p))(c, pows)
    assert FR.from_mont_host(np.asarray(ev[:, None]))[0] == poly_eval(xs, x)


def test_prefix_product():
    xs = _rand(33, 4)
    a = jnp.asarray(FR.to_mont_host(xs))
    out = FR.from_mont_host(np.asarray(jax.jit(
        lambda a: jpoly.prefix_product(FR, a, shift_one=True))(a)))
    expect = [1]
    acc = 1
    for x in xs[:-1]:
        acc = acc * x % R_MOD
        expect.append(acc)
    assert out == expect


def test_divide_linear():
    xs = _rand(50, 5)
    z = 1234567
    zm = jnp.asarray(FR.to_mont_host([z]))[:, 0]
    c = jnp.asarray(FR.to_mont_host(xs))
    q, r = jax.jit(lambda c, z: jpoly.divide_linear(FR, c, z))(c, zm)
    assert FR.from_mont_host(np.asarray(q)) == poly_divide_linear(xs, z)
    assert FR.from_mont_host(np.asarray(r[:, None]))[0] == poly_eval(xs, z)


def test_four_step_large_ntt():
    """Exercises the four-step path (log_n >= FOUR_STEP_MIN_LOG)."""
    log_n = jntt.FOUR_STEP_MIN_LOG
    n = 1 << log_n
    xs = _rand(n, 9)
    d = Domain(n)
    plan = jntt.get_plan(log_n)
    a = jnp.asarray(FR.to_mont_host(xs))
    out = FR.from_mont_host(np.asarray(jntt.ntt(plan, a)))
    assert out == d.fft(xs)
    back = FR.from_mont_host(np.asarray(jntt.intt(plan,
                                                  jnp.asarray(FR.to_mont_host(out)))))
    assert back == xs
    cs = FR.from_mont_host(np.asarray(jntt.coset_ntt(plan, a)))
    assert cs == d.coset_fft(xs)
    cb = FR.from_mont_host(np.asarray(jntt.coset_intt(
        plan, jnp.asarray(FR.to_mont_host(cs)))))
    assert cb == xs
