"""Polynomial utilities on device: powers tables, evaluation, synthetic
division, prefix products — counterparts of the reference's
`poly_eval_kernel`/`poly_reduce`/`exclusive_scan_add`/`exclusive_scan_mul`
(`lib/PLONK/utils/mont/cuda/mont_arithmetic.cu`), expressed as log-depth
array programs (`jax.lax.associative_scan` replaces the hand-rolled log-step
CUDA scans — SURVEY.md §5 "long-context" note 4).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import mont
from ..fields.mont import FR, U32


@partial(jax.jit, static_argnums=(0, 2))
def powers(cfg, x, n):
    """[1, x, x^2, ..., x^(n-1)] in Montgomery form; x is (L,) mont.
    Log-doubling: concat(arr, arr * x^len)."""
    one = jnp.asarray(cfg.one_mont, dtype=U32)[None]
    arr = jnp.concatenate([one, x[None]], axis=0) if n > 1 else one
    x_pow = mont.mont_sqr(cfg, x)  # x^2
    while arr.shape[0] < n:
        ext = mont.mont_mul(cfg, arr, x_pow[None])
        arr = jnp.concatenate([arr, ext], axis=0)
        x_pow = mont.mont_sqr(cfg, x_pow)
    return arr[:n]


@partial(jax.jit, static_argnums=(0,))
def sum_reduce(cfg, a):
    """Modular sum along axis 0 of (n, L) via a log-depth add tree."""
    n = a.shape[0]
    while n > 1:
        if n % 2 == 1:
            a = jnp.concatenate(
                [a, jnp.zeros((1, cfg.L), dtype=U32)], axis=0)
            n += 1
        a = mont.add(cfg, a[0::2], a[1::2])
        n //= 2
    return a[0]


@partial(jax.jit, static_argnums=(0,))
def poly_eval(cfg, coeffs, pows_of_x):
    """p(x) given a precomputed powers table (reference `evaluate`:
    powers kernel + dot reduce, function.cu)."""
    prods = mont.mont_mul(cfg, coeffs, pows_of_x[:coeffs.shape[0]])
    return sum_reduce(cfg, prods)


@partial(jax.jit, static_argnums=(0, 2))
def prefix_product(cfg, a, shift_one=False):
    """Inclusive prefix product along axis 0. With shift_one=True returns
    [1, a0, a0*a1, ...] of the same length (grand-product z(X) shape,
    `accumulate_mul_poly` + shift in the reference)."""
    scanned = jax.lax.associative_scan(
        lambda x, y: mont.mont_mul(cfg, x, y), a, axis=0)
    if not shift_one:
        return scanned
    one = jnp.asarray(cfg.one_mont, dtype=U32)[None]
    return jnp.concatenate([one, scanned[:-1]], axis=0)


@partial(jax.jit, static_argnums=(0,))
def divide_linear(cfg, coeffs, z):
    """Synthetic division by (X - z): returns (quotient (n-1, L), remainder
    (L,)). Log-depth via associative scan over affine maps — the TPU
    counterpart of the GPU's double-buffer `poly_div` kernel."""
    n = coeffs.shape[0]
    d = coeffs[::-1]  # Horner from most-significant coefficient
    zb = jnp.broadcast_to(z[None], d.shape)

    def combine(a, b):
        # each element is (value, z_power); b is "later" in scan order
        v1, p1 = a
        v2, p2 = b
        return (mont.add(cfg, v2, mont.mont_mul(cfg, p2, v1)),
                mont.mont_mul(cfg, p1, p2))

    s, _ = jax.lax.associative_scan(combine, (d, zb), axis=0)
    # s[k] = sum_{i<=k} d_i z^(k-i); quotient coeff q[i] = s[n-2-i]
    remainder = s[n - 1]
    quotient = s[:n - 1][::-1]
    return quotient, remainder
