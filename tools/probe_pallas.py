"""Can Pallas compile/run through the axon tunnel? Smoke + mont_mul proto."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 1. trivial kernel
def k1(x_ref, o_ref):
    o_ref[:] = x_ref[:] * jnp.uint32(3) + jnp.uint32(1)

@jax.jit
def f1(x):
    return pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

x = jnp.ones((8, 256), dtype=jnp.uint32)
print("trivial pallas:", np.asarray(f1(x))[0, :4])

# 2. mont_mul prototype: fr (16 limbs of 16 bits in u32), layout (L, n)
L = 16
MASK = np.uint32(0xFFFF)

R_MOD = 0x73eda753299d7d483339d80809a1d80553bda402fffe5bfeffffffff00000001
def int_to_limbs(v, L):
    return [(v >> (16*i)) & 0xFFFF for i in range(L)]
NPRIME = (-pow(R_MOD, -1, 1 << 256)) % (1 << 256)
MOD_L = np.array(int_to_limbs(R_MOD, L), dtype=np.uint32)
NP_L = np.array(int_to_limbs(NPRIME, L), dtype=np.uint32)

def mont_mul_kernel(a_ref, b_ref, o_ref):
    # a, b: (L, BLK) u32 16-bit limbs. CIOS over 16 limbs, unrolled.
    a = [a_ref[i, :] for i in range(L)]
    b = [b_ref[i, :] for i in range(L)]
    # accumulator t of L+2 columns, each < 2^32
    t = [jnp.zeros_like(a[0]) for _ in range(L + 2)]
    np0 = np.uint32(int(NP_L[0]))
    for i in range(L):
        # t += a[i] * b
        carry = jnp.zeros_like(a[0])
        for j in range(L):
            p = a[i] * b[j]
            s = t[j] + (p & MASK) + carry
            t[j] = s & MASK
            carry = (s >> 16) + (p >> 16)
        t[L] = t[L] + carry          # may exceed 16 bits; fold later
        # m = t[0] * n'[0] mod 2^16
        m = (t[0] * np0) & MASK
        carry = jnp.zeros_like(a[0])
        for j in range(L):
            p = m * np.uint32(int(MOD_L[j]))
            s = t[j] + (p & MASK) + carry
            t[j] = s & MASK
            carry = (s >> 16) + (p >> 16)
        s = t[L] + carry
        t[L] = s & MASK
        t[L + 1] = t[L + 1] + (s >> 16)
        # shift down one limb
        t = t[1:] + [jnp.zeros_like(a[0])]
    # final: t[0..L] with t[L] in {0,1}; conditional subtract
    # compare t >= MOD
    ge = t[L] > 0
    # lexicographic compare from top limb
    eq = jnp.ones_like(a[0], dtype=jnp.bool_)
    gt = jnp.zeros_like(a[0], dtype=jnp.bool_)
    for j in range(L - 1, -1, -1):
        mj = np.uint32(int(MOD_L[j]))
        gt = gt | (eq & (t[j] > mj))
        eq = eq & (t[j] == mj)
    ge = ge | gt | eq
    borrow = jnp.zeros_like(a[0])
    for j in range(L):
        d = t[j] - np.uint32(int(MOD_L[j])) - borrow
        borrow = (d >> 16) & np.uint32(1)   # borrow if wrapped
        sub = d & MASK
        o_ref[j, :] = jnp.where(ge, sub, t[j])

def mont_mul_p(a, b):
    return pl.pallas_call(
        mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b)

f = jax.jit(mont_mul_p)

# correctness vs python
rng = np.random.default_rng(0)
n = 1024
av = [int.from_bytes(rng.bytes(31), 'little') % R_MOD for _ in range(n)]
bv = [int.from_bytes(rng.bytes(31), 'little') % R_MOD for _ in range(n)]
A = np.array([int_to_limbs(v, L) for v in av], dtype=np.uint32).T.copy()  # (L, n)
B = np.array([int_to_limbs(v, L) for v in bv], dtype=np.uint32).T.copy()
out = np.asarray(f(jnp.asarray(A), jnp.asarray(B)))
R_inv = pow(1 << 256, -1, R_MOD)
ok = True
for e in range(n):
    got = sum(int(out[i, e]) << (16*i) for i in range(L))
    want = av[e] * bv[e] * R_inv % R_MOD
    if got != want:
        ok = False
        print("MISMATCH at", e, hex(got), hex(want))
        break
print("mont_mul pallas correct:", ok)

# throughput at 2^18 and 2^20 (grid over n blocks)
def mont_mul_big(a, b, blk=2048):
    n = a.shape[1]
    return pl.pallas_call(
        mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM))(a, b)

fb = jax.jit(mont_mul_big)

def run(f, *args):
    return np.asarray(f(*args)[:, :4])

for logn in (18, 20):
    nn = 1 << logn
    A2 = jnp.asarray(rng.integers(0, 1 << 16, (L, nn), dtype=np.uint32))
    B2 = jnp.asarray(rng.integers(0, 1 << 16, (L, nn), dtype=np.uint32))
    @jax.jit
    def chain(a, b, k=4):
        x = a
        for _ in range(k):
            x = mont_mul_big(x, b)
        return x[:, :4]
    np.asarray(chain(A2, B2))
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        o = chain(A2, B2)
    np.asarray(o)
    per = (time.time() - t0) / reps / 4
    print(f"pallas mont_mul fr 2^{logn}: {per*1e3:.3f} ms -> {nn/per/1e9:.2f} G/s")
