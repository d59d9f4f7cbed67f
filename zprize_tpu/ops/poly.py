"""Polynomial utilities on device: powers tables, evaluation, synthetic
division, prefix products — counterparts of the reference's
`poly_eval_kernel`/`poly_reduce`/`exclusive_scan_add`/`exclusive_scan_mul`
(`lib/PLONK/utils/mont/cuda/mont_arithmetic.cu`), expressed as log-depth
array programs over limbs-leading (L, n) tensors.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import mont
from ..fields.mont import FR, U32


def powers(cfg, x, n):
    """[1, x, x^2, ..., x^(n-1)] as (L, n) Montgomery; x is (L,) mont.
    Log-doubling: concat(arr, arr * x^len)."""
    one = jnp.asarray(cfg.one_mont, dtype=U32)[:, None]
    arr = jnp.concatenate([one, x[:, None]], axis=1) if n > 1 else one
    x_pow = mont.mont_sqr(cfg, x)  # x^2
    while arr.shape[1] < n:
        ext = mont.mont_mul(cfg, arr, x_pow[:, None])
        arr = jnp.concatenate([arr, ext], axis=1)
        x_pow = mont.mont_sqr(cfg, x_pow)
    return arr[:, :n]


def sum_reduce(cfg, a):
    """Modular sum along axis 1 of (L, n) via a log-depth add tree."""
    n = a.shape[1]
    while n > 1:
        if n % 2 == 1:
            a = jnp.concatenate(
                [a, jnp.zeros((cfg.L, 1), dtype=U32)], axis=1)
            n += 1
        a = mont.add(cfg, a[:, 0::2], a[:, 1::2])
        n //= 2
    return a[:, 0]


def poly_eval(cfg, coeffs, pows_of_x):
    """p(x) given a precomputed powers table (reference `evaluate`:
    powers kernel + dot reduce, function.cu)."""
    prods = mont.mont_mul(cfg, coeffs, pows_of_x[:, :coeffs.shape[1]])
    return sum_reduce(cfg, prods)


def poly_eval_many(cfg, coeff_list, pows_of_x):
    """Evaluate several (L, n) polys at one point: stacked batch matmul-free
    fold — returns (L, k)."""
    stacked = jnp.stack(coeff_list, axis=1)          # (L, k, n)
    prods = mont.mont_mul(cfg, stacked, pows_of_x[:, None, :])
    # tree-reduce along last axis
    n = prods.shape[2]
    a = prods
    while n > 1:
        if n % 2 == 1:
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:2] + (1,), dtype=U32)], axis=2)
            n += 1
        a = mont.add(cfg, a[:, :, 0::2], a[:, :, 1::2])
        n //= 2
    return a[:, :, 0]


def prefix_product(cfg, a, shift_one=False):
    """Inclusive prefix product along axis 1 of (L, n). With shift_one=True
    returns [1, a0, a0*a1, ...] of the same length (grand-product z(X)
    shape, `accumulate_mul_poly` + shift in the reference)."""
    scanned = jax.lax.associative_scan(
        lambda x, y: mont.mont_mul(cfg, x, y), a, axis=1)
    if not shift_one:
        return scanned
    one = jnp.asarray(cfg.one_mont, dtype=U32)[:, None]
    return jnp.concatenate([one, scanned[:, :-1]], axis=1)


def divide_linear(cfg, coeffs, z):
    """Synthetic division by (X - z): returns (quotient (L, n-1), remainder
    (L,)). Log-depth via associative scan over affine maps — the TPU
    counterpart of the GPU's double-buffer `poly_div` kernel."""
    n = coeffs.shape[1]
    d = coeffs[:, ::-1]  # Horner from most-significant coefficient
    zb = jnp.broadcast_to(z[:, None], d.shape)

    def combine(a, b):
        # each element is (value, z_power); b is "later" in scan order
        v1, p1 = a
        v2, p2 = b
        return (mont.add(cfg, v2, mont.mont_mul(cfg, p2, v1)),
                mont.mont_mul(cfg, p1, p2))

    s, _ = jax.lax.associative_scan(combine, (d, zb), axis=1)
    # s[k] = sum_{i<=k} d_i z^(k-i); quotient coeff q[i] = s[n-2-i]
    remainder = s[:, n - 1]
    quotient = s[:, :n - 1][:, ::-1]
    return quotient, remainder
