"""Direct warm timing of the prover's big fused programs (AOT-loaded),
with call signatures matching prove_tpu exactly.

    python tools/attr_quotient.py [height]
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


def t(label, fn, n_iter=3):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    first = time.time() - t0
    best = None
    for _ in range(n_iter):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"{label:45s} first={first:8.3f}s warm={best:8.4f}s", flush=True)
    return out


def main():
    height = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    wb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import bench as B
    state = B.load_setup(height, wb)
    assert state is not None
    lay, dev_pk, vk, dev_srs = state
    n = lay.n
    log_n = n.bit_length() - 1
    print(f"height={height} n=2^{log_n}", flush=True)

    from zprize_tpu.protocol import prover_tpu as tp
    from zprize_tpu.ops import ntt as jntt
    from zprize_tpu.fields.mont import FR
    from zprize_tpu.fields import mont

    plan = jntt.get_plan(log_n).warm()
    sct = jntt.get_subcoset_tables(log_n)

    rng = np.random.default_rng(0)
    ints = [int.from_bytes(rng.bytes(31), "little") for _ in range(4096)]
    a1 = jnp.asarray(FR.to_mont_host(ints))
    a = jnp.tile(a1, (1, n // 4096))
    zero = jnp.zeros((FR.L, n), dtype=jnp.uint32)
    ch_keys = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
               "range", "logic", "fbsm", "ca", "lookup")
    ch = {k: jnp.asarray(FR.scalar_mont(12345 + i))
          for i, k in enumerate(ch_keys)}

    t("_quotient_jit", lambda: tp._quotient_jit(
        plan, sct, dev_pk, a, a, a, a, a, a, a, zero, zero, zero, zero, ch))

    wires = jnp.stack([a, a, a, a], axis=1)
    sigma_evals = jnp.stack(dev_pk.sigma_evals_n, axis=1)
    s = jnp.asarray(FR.scalar_mont(777))
    out = t("_z_parts_jit", lambda: tp._z_parts_jit(
        sct.roots, wires, sigma_evals, zero, zero, zero, zero, s, s, s, s))
    num_z, den_z, tot_z = out[0], out[1], out[2]
    t("_z_finish_jit", lambda: tp._z_finish_jit(plan, num_z, den_z, s))

    stack19 = jnp.stack([a] * 19, axis=1)
    t("_eval_at_jit K=19", lambda: tp._eval_at_jit(stack19, s))
    stack11 = jnp.stack([a] * 11, axis=1)
    coeffs11 = jnp.asarray(FR.to_mont_host(list(range(1, 12))))
    t("_open_jit K=11", lambda: tp._open_jit(stack11, coeffs11, s))

    wires5 = jnp.stack([a] * 5, axis=1)
    t("_intt_jit (L,5,n)", lambda: tp._intt_jit(plan, wires5))


if __name__ == "__main__":
    main()
