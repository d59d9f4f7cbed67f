"""Round-2 TPU micro-bench of the production paths: pkern field ops,
NTT (2^13..2^22), MSM window at 2^17/2^20. Run on the real chip."""
import os, sys, time
import numpy as np
import jax

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(root, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, root)

import jax.numpy as jnp
from zprize_tpu.fields import mont
from zprize_tpu.fields.mont import FR, FQ

print(f"backend={jax.default_backend()} zb={mont.backend()}", flush=True)

def block(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[:8])

def timeit(label, f, *args, reps=5):
    t0 = time.time(); out = f(*args); block(out)
    print(f"  {label}: compile+run {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    block(out)
    dt = (time.time() - t0) / reps
    print(f"  {label}: {dt*1e3:.3f} ms", flush=True)
    return dt

rng = np.random.default_rng(0)

def rand_fr(m):
    limbs = rng.integers(0, 1 << 16, size=(FR.L, m), dtype=np.uint32)
    limbs[15] &= 0x7FFF
    return jnp.asarray(limbs)

def rand_fq(m):
    limbs = rng.integers(0, 1 << 16, size=(FQ.L, m), dtype=np.uint32)
    limbs[23] &= 0x0FFF
    return jnp.asarray(limbs)

# ---- field op throughput ----
if "field" in sys.argv or len(sys.argv) == 1:
    for logn in (20, 22):
        n = 1 << logn
        a, b = rand_fr(n), rand_fr(n)
        f = jax.jit(lambda a, b: mont.mont_mul(FR, a, b))
        dt = timeit(f"fr mul 2^{logn}", f, a, b)
        print(f"    -> {n/dt/1e9:.2f} G muls/s", flush=True)
    n = 1 << 18
    a, b = rand_fq(n), rand_fq(n)
    f = jax.jit(lambda a, b: mont.mont_mul(FQ, a, b))
    dt = timeit("fq mul 2^18", f, a, b)
    print(f"    -> {n/dt/1e9:.3f} G muls/s", flush=True)

# ---- chained: true compute rate (dispatch cancels) ----
if "chain" in sys.argv:
    def chained(k, cfg):
        @jax.jit
        def f(a, b):
            for _ in range(k):
                a = mont.mont_mul(cfg, a, b)
            return a
        return f
    for cfg, mk, logn in ((FR, rand_fr, 20), (FQ, rand_fq, 18)):
        n = 1 << logn
        a, b = mk(n), mk(n)
        f1, f2 = chained(2, cfg), chained(10, cfg)
        t1 = timeit(f"{cfg.name} chain2 2^{logn}", f1, a, b)
        t2 = timeit(f"{cfg.name} chain10 2^{logn}", f2, a, b)
        per = (t2 - t1) / 8
        print(f"    -> {cfg.name} mul: {per*1e3:.3f} ms/op = "
              f"{n/per/1e9:.2f} G muls/s", flush=True)

# ---- NTT ----
if "ntt" in sys.argv or len(sys.argv) == 1:
    from zprize_tpu.ops import ntt as jntt
    for logn in (13, 18, 22):
        plan = jntt.get_plan(logn)
        a = rand_fr(1 << logn)
        f = lambda a: jntt.ntt(plan, a)
        timeit(f"ntt 2^{logn}", f, a, reps=3)

# ---- MSM window ----
if "msm" in sys.argv or len(sys.argv) == 1:
    from zprize_tpu.ops import msm as jmsm
    for logn in (17, 20):
        n = 1 << logn
        x, y = rand_fq(n), rand_fq(n)
        digits = jnp.asarray(
            rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))
        wb = 16
        cap = jmsm.bucket_capacity(n, wb)
        print(f"  msm 2^{logn}: wb={wb} cap={cap}", flush=True)
        f = jax.jit(lambda x, y, d: jmsm._msm_jit(x, y, d, jnp.int32(0), wb, cap))
        t0 = time.time()
        out = f(x, y, digits); block(out)
        print(f"  msm16w 2^{logn}: compile+run {time.time()-t0:.2f}s",
              flush=True)
        t0 = time.time()
        out = f(x, y, digits); block(out)
        dt = time.time() - t0
        print(f"  msm 16 windows 2^{logn}: {dt*1e3:.1f} ms "
              f"({dt/16*1e3:.1f} ms/window)", flush=True)
