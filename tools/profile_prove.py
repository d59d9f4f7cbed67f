"""Per-program warm execution timing for the prover's fused programs.

Loads the persisted h{H} bench setup and times each jitted program's
execution (post-compile, blocking on outputs) to attribute prove wall-time.

    python tools/profile_prove.py [height] [window_bits]
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
    """Time fn: first call (compile/load+exec), then warm iterations."""
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
    height = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    wb = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    sys.path.insert(0, ROOT)
    import bench as B
    state = B.load_setup(height, wb)
    assert state is not None, "run `python bench.py setup` first"
    lay, dev_pk, vk, dev_srs = state
    n = lay.n
    log_n = n.bit_length() - 1
    print(f"height={height} n=2^{log_n} wb={wb}")

    from zprize_tpu.protocol import prover_tpu as tp
    from zprize_tpu.ops import ntt as jntt
    from zprize_tpu.ops import msm as jmsm
    from zprize_tpu.fields.mont import FR
    from zprize_tpu.fields import mont

    cfg = tp.ProverConfig(msm_backend="device", msm_window_bits=wb)
    plan = jntt.get_plan(log_n).warm()
    sct = jntt.get_subcoset_tables(log_n)

    rng = np.random.default_rng(0)
    ints = [int(x) for x in rng.integers(1, 1 << 60, size=n)]
    a = jnp.asarray(FR.to_mont_host(ints))

    # core ops
    t("mont_mul (L,n)", lambda: mont.mont_mul(FR, a, a))
    t("intt (L,5,n)", lambda: tp._intt_jit(
        plan, jnp.stack([a] * 5, axis=1)))

    # commit pipeline
    srs_x = dev_srs.points[0][:, :n]
    srs_y = dev_srs.points[1][:, :n]
    cap = jmsm.bucket_capacity(n, wb)
    polys2 = jnp.stack([a, a], axis=1)
    # NOTE: wb/cap as KEYWORDS — the prover calls it that way and the AOT
    # export's pytree structure includes the args/kwargs split
    t(f"_commit_batch_jit B=2 wb={wb} cap={cap}",
      lambda: tp._commit_batch_jit(srs_x, srs_y, polys2, jnp.int32(0),
                                   wb=wb, cap=cap))

    # full commit_batch host wrapper (4 wires)
    polys4 = jnp.stack([a] * 4, axis=1)
    t("commit_batch B=4 (host wrapper)",
      lambda: tp.commit_batch(dev_srs, polys4, cfg))

    # z parts + finish
    wires = jnp.stack([a] * 4, axis=1)
    sigma_evals = jnp.stack(dev_pk.sigma_evals_n, axis=1)
    zero = jnp.zeros((FR.L, n), dtype=jnp.uint32)
    ch = jnp.asarray(FR.scalar_mont(12345))
    out = t("_z_parts_jit", lambda: tp._z_parts_jit(
        sct.roots, wires, sigma_evals, zero, zero, zero, zero,
        ch, ch, ch, ch))
    num_z, den_z, tot_z, num_2, den_2, tot_2 = out
    inv_z = jnp.asarray(FR.scalar_mont(99999))
    t("_z_finish_jit", lambda: tp._z_finish_jit(plan, num_z, den_z, inv_z))

    # quotient
    chd = {k: ch for k in ("alpha", "beta", "gamma", "delta", "epsilon",
                           "zeta", "range", "logic", "fbsm", "ca", "lookup")}
    t("_quotient_jit", lambda: tp._quotient_jit(
        plan, sct, dev_pk, a, a, a, a, a, a, a, zero, zero, zero, zero,
        chd))

    # evals + lincomb + open
    stack19 = jnp.stack([a] * 19, axis=1)
    t("_eval_at_jit K=19", lambda: tp._eval_at_jit(stack19, ch))
    coeffs = jnp.asarray(FR.to_mont_host(list(range(1, 20))))
    t("_lincomb_jit K=19", lambda: tp._lincomb_jit(stack19, coeffs))
    stack11 = jnp.stack([a] * 11, axis=1)
    coeffs11 = jnp.asarray(FR.to_mont_host(list(range(1, 12))))
    t("_open_jit K=11", lambda: tp._open_jit(stack11, coeffs11, ch))


if __name__ == "__main__":
    main()
