"""Probe the axon TPU runtime's cost model: scan-iteration overhead,
per-op overhead inside jit, eager dispatch latency, mont-mul throughput.
Run: /opt/venv/bin/python tools/probe_runtime.py
"""
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

print("devices:", jax.devices(), file=sys.stderr)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


# 1. lax.scan iteration overhead: tiny body, N iterations
x0 = jnp.ones((8, 128), dtype=jnp.uint32)

for n_iter in (128, 1024):
    @jax.jit
    def scan_tiny(x, n=n_iter):
        def body(c, _):
            return c * jnp.uint32(3) + jnp.uint32(1), ()
        c, _ = jax.lax.scan(body, x, None, length=n)
        return c
    t = timeit(scan_tiny, x0)
    print(f"scan tiny body x{n_iter}: {t*1e3:.2f} ms total, "
          f"{t/n_iter*1e6:.1f} us/iter")

# 2. scan with medium body (mont-mul-sized: ~100 vector ops on (16, 65536))
y0 = jnp.ones((16, 1 << 16), dtype=jnp.uint32)


@jax.jit
def scan_med(y):
    def body(c, _):
        for _ in range(20):
            c = (c * jnp.uint32(2654435761) + jnp.uint32(1)) & jnp.uint32(0xffff)
        return c, ()
    c, _ = jax.lax.scan(body, y, None, length=128)
    return c


t = timeit(scan_med, y0)
print(f"scan 20-op body on (16,65536) x128: {t*1e3:.2f} ms, "
      f"{t/128*1e6:.1f} us/iter")

# 3. unrolled sequential tiny ops inside one jit (256 deps)
@jax.jit
def unrolled_tiny(x):
    for _ in range(256):
        x = x * jnp.uint32(3) + jnp.uint32(1)
    return x


t = timeit(unrolled_tiny, x0)
print(f"unrolled 256 tiny sequential ops: {t*1e3:.2f} ms, "
      f"{t/256*1e6:.1f} us/op")

# 4. eager dispatch latency (tiny jitted fn called 50x)
@jax.jit
def one_op(x):
    return x * jnp.uint32(3) + jnp.uint32(1)


one_op(x0).block_until_ready()
t0 = time.time()
x = x0
for _ in range(50):
    x = one_op(x)
jax.block_until_ready(x)
print(f"eager jitted-call chain x50: {(time.time()-t0)/50*1e3:.2f} ms/call")

# 5. mont_mul throughput fr/fq at 2^18 (current impl)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from zprize_tpu.fields import mont
from zprize_tpu.fields.mont import FR, FQ

rng = np.random.default_rng(0)
for cfg, name in ((FR, "fr"), (FQ, "fq")):
    n = 1 << 18
    a = jnp.asarray(rng.integers(0, 1 << 16, (n, cfg.L), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (n, cfg.L), dtype=np.uint32))
    f = jax.jit(lambda a, b, c=cfg: mont.mont_mul(c, a, b))
    t = timeit(f, a, b)
    print(f"mont_mul {name} 2^18: {t*1e3:.2f} ms = {n/t/1e9:.2f} G/s")

# 6. scan iteration overhead with WIDE body (batch_inv-like: one mont_mul
# on (m,16) per step) - m=512
from functools import partial


@jax.jit
def scan_wide(a):
    def body(c, x):
        return mont.mont_mul(FR, c, x), ()
    c, _ = jax.lax.scan(body, a[0], a)
    return c


aa = jnp.asarray(rng.integers(0, 1 << 16, (128, 512, 16), dtype=np.uint32))
t = timeit(scan_wide, aa)
print(f"scan mont_mul body (512,16) x128: {t*1e3:.2f} ms, "
      f"{t/128*1e6:.1f} us/iter")

# 7. argsort + gather at 2^18 (MSM sort cost)
d = jnp.asarray(rng.integers(0, 1 << 16, (1 << 18,), dtype=np.uint32))
pts = jnp.asarray(rng.integers(0, 1 << 16, (1 << 18, 24), dtype=np.uint32))


@jax.jit
def sortgather(d, pts):
    order = jnp.argsort(d)
    return jnp.take(d, order), jnp.take(pts, order, axis=0)


t = timeit(sortgather, d, pts)
print(f"argsort+gather 2^18 x(24 limbs): {t*1e3:.2f} ms")

# 8. scatter 2^18 points into (2^16, 8, 24) grid
tgt_b = d  # bucket ids
pos = jnp.asarray(rng.integers(0, 8, (1 << 18,), dtype=np.uint32))


@jax.jit
def scatter(pts, tgt_b, pos):
    grid = jnp.zeros((1 << 16, 8, 24), dtype=jnp.uint32)
    return grid.at[tgt_b, pos].set(pts, mode="drop")


t = timeit(scatter, pts, tgt_b, pos)
print(f"scatter 2^18 x24limbs into (2^16,8): {t*1e3:.2f} ms")
