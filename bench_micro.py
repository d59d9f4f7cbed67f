"""Microbenchmarks on the real TPU chip: field mul, NTT, EC add, MSM window,
Poseidon witness throughput. Informs bench.py config and optimization work.

Usage: /opt/venv/bin/python bench_micro.py  (runs on the axon TPU)
"""

import os
import time
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from zprize_tpu import jaxcache  # noqa: E402
jaxcache.configure(min_compile_secs=0.5)

import jax.numpy as jnp

from zprize_tpu.fields import mont
from zprize_tpu.fields.mont import FR, FQ, U32
from zprize_tpu.ops import ntt as jntt
from zprize_tpu.curve import g1


def timed(label, fn, *args, iters=3):
    fn_j = jax.jit(fn)
    t0 = time.time()
    out = jax.block_until_ready(fn_j(*args))
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn_j(*args))
    run_t = (time.time() - t0) / iters
    print(f"{label:40s} compile {compile_t:7.2f}s   run {run_t*1e3:9.2f}ms")
    return run_t


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    for logn in (16, 18, 20):
        n = 1 << logn
        a = jnp.asarray(rng.integers(0, 1 << 16, (n, FR.L), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, (n, FR.L), dtype=np.uint32))
        t = timed(f"fr mont_mul n=2^{logn}",
                  lambda x, y: mont.mont_mul(FR, x, y), a, b)
        print(f"    -> {n/t/1e6:.1f} M fr-mul/s")

    n = 1 << 18
    aq = jnp.asarray(rng.integers(0, 1 << 16, (n, FQ.L), dtype=np.uint32))
    bq = jnp.asarray(rng.integers(0, 1 << 16, (n, FQ.L), dtype=np.uint32))
    t = timed("fq mont_mul n=2^18",
              lambda x, y: mont.mont_mul(FQ, x, y), aq, bq)
    print(f"    -> {n/t/1e6:.1f} M fq-mul/s")

    # xyzz add
    p = {k: jnp.asarray(rng.integers(0, 1 << 16, (n, FQ.L), dtype=np.uint32))
         for k in ("X", "Y", "ZZ", "ZZZ")}
    t = timed("xyzz_add n=2^18", g1.xyzz_add, p, p)
    print(f"    -> {n/t/1e6:.2f} M ec-add/s")

    # NTT
    for logn in (16, 18, 20):
        plan = jntt.get_plan(logn)
        n = 1 << logn
        a = jnp.asarray(rng.integers(0, 1 << 16, (n, FR.L), dtype=np.uint32))
        timed(f"ntt 2^{logn}", lambda x: jntt.ntt(plan, x), a)

    # Poseidon witness batch
    from zprize_tpu.poseidon.vectorized import poseidon_states
    m = 1 << 13
    l = jnp.asarray(rng.integers(0, 1 << 16, (m, FR.L), dtype=np.uint32))
    t = timed("poseidon_states batch 2^13",
              lambda a, b: poseidon_states(a, b), l, l)
    print(f"    -> {m/t/1e3:.1f} K hashes/s")

    # MSM window at 2^18, c=16
    from zprize_tpu.ops.msm import msm_window
    n = 1 << 18
    xs = jnp.asarray(rng.integers(0, 1 << 16, (n, FQ.L), dtype=np.uint32))
    ys = jnp.asarray(rng.integers(0, 1 << 16, (n, FQ.L), dtype=np.uint32))
    infs = jnp.zeros((n,), dtype=bool)
    digs = jnp.asarray(rng.integers(0, 1 << 16, (n,), dtype=np.uint32))
    t0 = time.time()
    out = msm_window(xs, ys, infs, digs, 16)
    jax.block_until_ready(out["X"])
    print(f"msm_window 2^18 c=16: first (incl compile) {time.time()-t0:.2f}s")
    t0 = time.time()
    out = msm_window(xs, ys, infs, digs, 16)
    jax.block_until_ready(out["X"])
    t = time.time() - t0
    print(f"msm_window 2^18 c=16: run {t:.3f}s -> full 2^18 MSM (16 win) ~ {16*t:.1f}s")


if __name__ == "__main__":
    main()
