"""Probe v3: chained repetitions inside one jit, tiny D2H at end.
cost_per_op = (T(K2) - T(K1)) / (K2 - K1) -- D2H and dispatch cancel."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from zprize_tpu.fields import mont
from zprize_tpu.fields.mont import FR, FQ

def run(f, *args):
    out = f(*args)
    return np.asarray(jax.tree.leaves(out)[0].ravel()[:8])

def t_of(f, *args, reps=3):
    run(f, *args)  # warm
    t0 = time.time()
    for _ in range(reps): run(f, *args)
    return (time.time() - t0) / reps

def chained_cost(make_f, k1, k2, *args, label=""):
    f1, f2 = make_f(k1), make_f(k2)
    t1, t2 = t_of(f1, *args), t_of(f2, *args)
    per = (t2 - t1) / (k2 - k1)
    print(f"{label}: {per*1e3:.3f} ms/op  (T{k1}={t1*1e3:.1f}ms T{k2}={t2*1e3:.1f}ms)")
    return per

rng = np.random.default_rng(0)

# mont_mul fr/fq at 2^18 and 2^20
for cfg, name in ((FR, "fr"), (FQ, "fq")):
    for logn in (18, 20):
        n = 1 << logn
        a = jnp.asarray(rng.integers(0, 1 << 16, (n, cfg.L), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, (n, cfg.L), dtype=np.uint32))
        def mk(k, c=cfg):
            @jax.jit
            def f(a, b):
                x = a
                for _ in range(k):
                    x = mont.mont_mul(c, x, b)
                return jnp.sum(x[:, 0])
            return f
        per = chained_cost(mk, 2, 6, a, b, label=f"mont_mul {name} 2^{logn}")
        print(f"   -> {n/per/1e9:.2f} G muls/s")

# xyzz_add at 2^18
from zprize_tpu.curve import g1
n = 1 << 18
P = {k: jnp.asarray(rng.integers(0, 1 << 16, (n, FQ.L), dtype=np.uint32)) for k in ("X","Y","ZZ","ZZZ")}
Q = {k: jnp.asarray(rng.integers(0, 1 << 16, (n, FQ.L), dtype=np.uint32)) for k in ("X","Y","ZZ","ZZZ")}
def mk(k):
    @jax.jit
    def f(P, Q):
        x = P
        for _ in range(k):
            x = g1.xyzz_add(x, Q)
        return jnp.sum(x["X"][:, 0])
    return f
per = chained_cost(mk, 1, 3, P, Q, label="xyzz_add 2^18")
print(f"   -> {n/per/1e6:.1f} M adds/s")

# argsort+gather 2^18, 24-limb payload
d = jnp.asarray(rng.integers(0, 1 << 16, (n,), dtype=np.uint32))
pts = jnp.asarray(rng.integers(0, 1 << 16, (n, 24), dtype=np.uint32))
def mk(k):
    @jax.jit
    def f(d, pts):
        s = jnp.uint32(0)
        for i in range(k):
            order = jnp.argsort(d + s)
            g_ = jnp.take(pts, order, axis=0)
            s = s + g_[0, 0]
        return s
    return f
chained_cost(mk, 1, 3, d, pts, label="argsort+gather(24) 2^18")

# scatter 2^18 rows -> (2^16, 8, 24)
pos = jnp.asarray(rng.integers(0, 8, (n,), dtype=np.uint32))
def mk(k):
    @jax.jit
    def f(pts, d, pos):
        s = jnp.uint32(0)
        for i in range(k):
            grid = jnp.zeros((1 << 16, 8, 24), dtype=jnp.uint32)
            grid = grid.at[d, pos + s].set(pts, mode="drop")
            s = s + grid[0, 0, 0]
        return s
    return f
chained_cost(mk, 1, 3, pts, d, pos, label="scatter 2^18->(2^16,8,24)")

# gather rows by index (take axis 0) 2^18 x 24
idx = jnp.asarray(rng.integers(0, n, (n,), dtype=np.uint32))
def mk(k):
    @jax.jit
    def f(pts, idx):
        s = jnp.uint32(0)
        for i in range(k):
            g_ = jnp.take(pts, (idx + s) % n, axis=0)
            s = s + g_[0, 0]
        return s
    return f
chained_cost(mk, 1, 3, pts, idx, label="gather(24) 2^18")

# H2D bandwidth: upload 64MB numpy + tiny reduce
big = rng.integers(0, 1 << 16, (1 << 20, 16), dtype=np.uint32)  # 64MB
@jax.jit
def red(x): return jnp.sum(x[:, 0])
run(red, jnp.asarray(big))
t0 = time.time()
for _ in range(3):
    xb = jnp.asarray(big)   # H2D
    run(red, xb)
t = (time.time() - t0) / 3
print(f"H2D 64MB + reduce: {t*1e3:.1f} ms -> {64/t:.0f} MB/s")

# D2H bandwidth: pull 16MB
xb = jnp.asarray(big[: 1 << 18])  # 16MB
np.asarray(xb)
t0 = time.time()
for _ in range(3): np.asarray(xb)
t = (time.time()-t0)/3
print(f"D2H 16MB: {t*1e3:.1f} ms -> {16/t:.0f} MB/s")

# D2H tiny latency
small = jnp.ones((8,), dtype=jnp.uint32)
np.asarray(small)
t0 = time.time()
for _ in range(20): np.asarray(small)
print(f"D2H tiny: {(time.time()-t0)/20*1e3:.2f} ms")
