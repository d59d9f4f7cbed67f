"""Bisect the h13 (n=2^20) MSM TPU-worker crash: run each stage of the
grouped window grid standalone on the chip, smallest first.

    python tools/repro_2e20_msm.py [stage] [log_n]

stages: digits | sortgather | tree | window | commit
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
from zprize_tpu.fields import mont
from zprize_tpu.fields.mont import FR, FQ
from zprize_tpu.ops import msm as jmsm
from zprize_tpu.curve import g1


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "window"
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n = 1 << log_n
    wb = 8
    cap = jmsm.bucket_capacity(n, wb)
    B = 1 << wb
    print(f"n=2^{log_n} wb={wb} cap={cap}", flush=True)

    rng = np.random.default_rng(0)
    # pseudorandom digits, same distribution as real scalars
    digits = jnp.asarray(
        rng.integers(0, B, size=(1, n), dtype=np.uint32))
    # synthetic-but-plausible Montgomery field values for x/y; point math
    # special cases (doubling etc.) won't trigger crashes differently
    xs = jnp.asarray(FQ.to_mont_host(
        [int.from_bytes(rng.bytes(47), "little") % FQ.mod
         for _ in range(4096)]))
    reps = n // 4096
    x_mont = jnp.tile(xs, (1, reps))
    y_mont = jnp.tile(xs[:, ::-1], (1, reps))

    if stage == "digits":
        out = jax.jit(lambda d: d.sum())(digits)
        jax.block_until_ready(out)
        print("digits ok", flush=True)
        return

    if stage == "sortgather":
        def f(x, d):
            dw = d[0]
            order = jnp.argsort(dw)
            d_s = jnp.take(dw, order)
            bounds = jnp.searchsorted(
                d_s, jnp.arange(B + 1, dtype=jnp.uint32)).astype(jnp.int32)
            starts = bounds[:B]
            slot = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None]
            src = jnp.take(order, jnp.clip(slot, 0, n - 1).reshape(-1))
            gx = jnp.take(x, src, axis=1).reshape(FQ.L, B, cap)
            return gx[:, 0, 0]
        t0 = time.time()
        out = jax.jit(f)(x_mont, digits)
        _ = np.asarray(out).ravel()[0]
        print(f"sortgather ok {time.time()-t0:.1f}s", flush=True)
        return

    if stage == "tree":
        reps2 = -((-B * cap) // n)
        xw = jnp.tile(x_mont, (1, reps2))[:, :B * cap]
        yw = jnp.tile(y_mont, (1, reps2))[:, :B * cap]
        gx = xw.reshape(FQ.L, 1, B, cap)
        gy = yw.reshape(FQ.L, 1, B, cap)
        t0 = time.time()
        bx, by = jax.jit(g1.affine_tree_sum)(gx, gy)
        _ = np.asarray(bx).ravel()[0]
        print(f"affine tree ok {time.time()-t0:.1f}s", flush=True)
        return

    if stage == "window":
        t0 = time.time()
        pt, over = jax.jit(
            lambda x, y, d: jmsm.msm_window_grid_batch(x, y, d, wb, cap)
        )(x_mont, y_mont, digits)
        _ = np.asarray(pt["X"]).ravel()[0]
        print(f"window ok {time.time()-t0:.1f}s over={np.asarray(over)}",
              flush=True)
        return

    if stage == "commit":
        from zprize_tpu.protocol.prover_tpu import _commit_batch_jit
        polys = jnp.tile(
            jnp.asarray(FR.to_mont_host(
                [int.from_bytes(rng.bytes(31), "little")
                 for _ in range(4096)]))[:, None, :], (1, 2, reps))
        reps_n = int(os.environ.get("REPRO_REPEAT", "1"))
        for r in range(reps_n):
            t0 = time.time()
            pts, over = _commit_batch_jit(x_mont, y_mont, polys,
                                          jnp.int32(0), wb=wb, cap=cap)
            # np.asarray D2H: block_until_ready does NOT drain the async
            # queue on the axon runtime (round-1 lesson)
            _ = np.asarray(pts["X"]).ravel()[0]
            dev = jax.local_devices()[0]
            ms = getattr(dev, "memory_stats", lambda: {})() or {}
            used = ms.get("bytes_in_use", 0) / 2**30
            peak = ms.get("peak_bytes_in_use", 0) / 2**30
            print(f"commit[{r}] ok {time.time()-t0:.1f}s "
                  f"hbm_used={used:.2f}GiB peak={peak:.2f}GiB", flush=True)
        return

    raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
