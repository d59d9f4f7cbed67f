"""Probe v2: force real completion by fetching result bytes to host."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def timeit(fn, *args, reps=3):
    np.asarray(jax.tree.leaves(fn(*args))[0])  # warm + drain
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])        # drain via D2H
    return (time.time() - t0) / reps

x0 = jnp.ones((8, 128), dtype=jnp.uint32)

# D2H baseline latency
t0 = time.time()
for _ in range(10): np.asarray(x0)
d2h = (time.time()-t0)/10
print(f"D2H (8,128): {d2h*1e3:.2f} ms")

for n_iter in (128, 1024):
    @jax.jit
    def scan_tiny(x, n=n_iter):
        def body(c, _): return c * jnp.uint32(3) + jnp.uint32(1), ()
        c, _ = jax.lax.scan(body, x, None, length=n)
        return c
    t = timeit(scan_tiny, x0)
    print(f"scan tiny x{n_iter}: {t*1e3:.2f} ms, {t/n_iter*1e6:.2f} us/iter")

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
print(f"scan 20-op (16,65536) x128: {t*1e3:.2f} ms, {t/128*1e6:.1f} us/iter")

@jax.jit
def unrolled_tiny(x):
    for _ in range(256): x = x * jnp.uint32(3) + jnp.uint32(1)
    return x
t = timeit(unrolled_tiny, x0)
print(f"unrolled 256 tiny: {t*1e3:.2f} ms, {t/256*1e6:.1f} us/op")

@jax.jit
def one_op(x): return x * jnp.uint32(3) + jnp.uint32(1)
np.asarray(one_op(x0))
t0 = time.time()
x = x0
for _ in range(50): x = one_op(x)
np.asarray(x)
print(f"eager chain x50: {(time.time()-t0)/50*1e3:.2f} ms/call")

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

@jax.jit
def scan_wide(a):
    def body(c, x): return mont.mont_mul(FR, c, x), ()
    c, _ = jax.lax.scan(body, a[0], a)
    return c
aa = jnp.asarray(rng.integers(0, 1 << 16, (128, 512, 16), dtype=np.uint32))
t = timeit(scan_wide, aa)
print(f"scan mont_mul (512,16) x128: {t*1e3:.2f} ms, {t/128*1e6:.1f} us/iter")

d = jnp.asarray(rng.integers(0, 1 << 16, (1 << 18,), dtype=np.uint32))
pts = jnp.asarray(rng.integers(0, 1 << 16, (1 << 18, 24), dtype=np.uint32))
@jax.jit
def sortgather(d, pts):
    order = jnp.argsort(d)
    return jnp.take(d, order), jnp.take(pts, order, axis=0)
t = timeit(sortgather, d, pts)
print(f"argsort+gather 2^18: {t*1e3:.2f} ms")

pos = jnp.asarray(rng.integers(0, 8, (1 << 18,), dtype=np.uint32))
@jax.jit
def scatter(pts, tgt_b, pos):
    grid = jnp.zeros((1 << 16, 8, 24), dtype=jnp.uint32)
    return grid.at[tgt_b, pos].set(pts, mode="drop")
t = timeit(scatter, pts, d, pos)
print(f"scatter 2^18 -> (2^16,8): {t*1e3:.2f} ms")

# big sequential scan like old batch_inv: 2^15 steps, (16,) body
@jax.jit
def scan_seq(a):
    def body(c, x): return mont.mont_mul(FR, c, x), ()
    c, _ = jax.lax.scan(body, a[0], a)
    return c
bb = jnp.asarray(rng.integers(0, 1 << 16, (1 << 15, 16), dtype=np.uint32))
t = timeit(scan_seq, bb, reps=1)
print(f"scan mont_mul single-elem x2^15: {t*1e3:.1f} ms, {t/(1<<15)*1e6:.1f} us/iter")
