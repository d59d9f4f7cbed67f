"""Targeted on-chip attribution for the round-5 perf work.

Times, warm, on the real chip:
  * batched forward transform (L, 31, n) — the quotient scan step's NTT load
  * _quotient_jit (h10 shapes, AOT-loaded)
  * argsort-only program (64 windows of n) — the MSM sort share
  * xyzz_add pallas at MSM tree-level width — the MSM add share
  * grid gather program — the MSM gather share

    python tools/attr_micro.py [height]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np
import jax

from zprize_tpu import jaxcache
jaxcache.configure(ROOT)

import jax.numpy as jnp


def t(label, fn, *args, n_iter=3, **kw):
    t0 = time.time()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    first = time.time() - t0
    best = None
    for _ in range(n_iter):
        t0 = time.time()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"{label:45s} first={first:8.3f}s warm={best:8.4f}s", flush=True)
    return out


def main():
    height = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from zprize_tpu.ops import ntt as jntt
    from zprize_tpu.ops import msm as jmsm
    from zprize_tpu.fields.mont import FR, FQ
    from zprize_tpu.fields import mont
    from zprize_tpu.curve import g1

    log_n = height + 7
    n = 1 << log_n
    plan = jntt.get_plan(log_n).warm()
    print(f"n=2^{log_n}")

    rng = np.random.default_rng(0)
    ints = [int.from_bytes(rng.bytes(31), "little") for _ in range(4096)]
    a1 = jnp.asarray(FR.to_mont_host(ints))
    reps = n // 4096
    a = jnp.tile(a1, (1, reps))

    f31 = jax.jit(lambda p, x: jntt.transform_last(p, x, False))
    st31 = jnp.broadcast_to(a[:, None, :], (FR.L, 31, n))
    st31 = jnp.asarray(st31)
    t("ntt fwd (L,31,n)", lambda: f31(plan, st31))

    f1 = jax.jit(lambda p, x: jntt.transform_last(p, x, False))
    t("ntt fwd (L,n)", lambda: f1(plan, a))

    # elementwise mul at quotient-widget scale: 150 muls of (L, n)
    def widget_like(x):
        y = x
        for _ in range(150):
            y = mont.mont_mul(FR, y, x)
        return y
    fw = jax.jit(widget_like)
    t("150 chained mont_mul (L,n)", lambda: fw(a))

    # MSM internals at wb=8
    wb = 8
    cap = jmsm.bucket_capacity(n, wb)
    raw = mont.from_mont(FR, a)
    digits = jmsm.limbs16_to_digits(raw, wb)          # (32, n)
    digits = jnp.concatenate([digits, digits], axis=0)  # 64 windows

    def sort_only(d):
        def body(c, dw):
            order = jnp.argsort(dw)
            return c, order[0]
        _, o = jax.lax.scan(body, 0, d)
        return o
    fs = jax.jit(sort_only)
    t("argsort x64 (n,)", lambda: fs(digits))

    # gather-only: the slot-grid gather for 64 windows
    B = 1 << wb
    srs_like_x = jnp.broadcast_to(
        jnp.asarray(FQ.to_mont_host(
            [int.from_bytes(rng.bytes(47), "little") % FQ.mod]))[:, 0][
            :, None], (FQ.L, n))
    srs_like_x = jnp.asarray(srs_like_x)

    def gather_only(xm, d):
        def body(c, dw):
            order = jnp.argsort(dw)
            d_s = jnp.take(dw, order)
            bounds = jnp.searchsorted(
                d_s, jnp.arange(B + 1, dtype=jnp.uint32)).astype(jnp.int32)
            starts = bounds[:B]
            slot = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
            src = jnp.take(order, jnp.clip(slot, 0, n - 1).reshape(-1))
            gx = jnp.take(xm, src, axis=1).reshape(FQ.L, B, cap)
            return c, gx[:, 0, 0]
        _, o = jax.lax.scan(body, 0, d)
        return o
    fg = jax.jit(gather_only)
    t("argsort+grid-gather x64", lambda: fg(srs_like_x, digits))

    # one tree level of xyzz_add at (L, B*cap/2) width, 64 times
    m = B * cap // 2
    px = jnp.broadcast_to(srs_like_x[:, :m], (FQ.L, m))
    p = {"X": jnp.asarray(px), "Y": jnp.asarray(px),
         "ZZ": jnp.asarray(px), "ZZZ": jnp.asarray(px)}

    def adds_once(p):
        def body(c, _):
            q = g1.xyzz_add(p, p)
            return c, q["X"][:, 0]
        _, o = jax.lax.scan(body, 0, jnp.arange(64))
        return o
    fa = jax.jit(adds_once)
    t(f"xyzz_add (L,{m}) x64", lambda: fa(p))

    def affine2_once(px):
        def body(c, _):
            q = g1.xyzz_add_affine2(px, px, px, px)
            return c, q["X"][:, 0]
        _, o = jax.lax.scan(body, 0, jnp.arange(64))
        return o
    f2 = jax.jit(affine2_once)
    t(f"xyzz_add_affine2 (L,{m}) x64", lambda: f2(px))


if __name__ == "__main__":
    main()
