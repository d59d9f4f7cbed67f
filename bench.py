"""End-to-end gen_proof benchmark on the real TPU chip.

Workload: PLONK proof for a height-H Poseidon Merkle tree (the reference's
official zprize_bench workload at H=15; BENCH_HEIGHT scales it down while the
single-chip prover is being optimized — the vs_baseline figure scales the
reference's 9.3 s by circuit size, see BASELINE.md).

Setup (SRS + preprocessing + compile warm-up) is SPLIT from the scored run,
exactly like the reference excludes pk-clone/setup from its scored loop
(`Prize 1B/benches/pnp_bench.rs:62-143`):

    python bench.py setup   # build + persist SRS/pk/vk, warm compile caches
    python bench.py         # scored: load keys, witness + prove + verify

The scored run auto-falls-back to running setup in-process when the caches
are missing (slow but correct), so a cold driver invocation still lands a
number. Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import faulthandler
import json
import os
import signal
import sys
import time

# kill -USR1 <pid> dumps all thread stacks (where is the lowering/compile?)
faulthandler.register(signal.SIGUSR1, all_threads=True)

import numpy as np
import jax

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
from zprize_tpu import jaxcache  # noqa: E402

if os.environ.get("BENCH_CPU") == "1":      # debug/smoke runs off-chip
    jax.config.update("jax_platforms", "cpu")
    jaxcache.disable()
else:
    # TPU-only persistent cache: CPU compiles (twiddle-table builders etc.)
    # are fenced out — XLA:CPU AOT entries embed host CPU features and
    # poison the cache when the bench host differs from the builder host
    # (BENCH_r02's failure mode; see zprize_tpu/jaxcache.py).
    jaxcache.configure(ROOT)

import jax.numpy as jnp

BASELINE_GEN_PROOF_S = 9.3      # reference README (RTX 6000 Ada), height 15
BASELINE_LOG_N = 22             # proving domain at height 15


def cache_dir(height, window_bits):
    return os.path.join(ROOT, ".bench_cache", f"h{height}_w{window_bits}")


def build_setup(height, window_bits, run_warmup=True):
    """SRS + preprocess + persist; optional warm-up prove to populate the
    persistent compile cache. Mirrors the reference's un-scored setup."""
    from zprize_tpu.merkle.layout import MerkleLayout
    from zprize_tpu.merkle.preprocess import preprocess_layout
    from zprize_tpu.protocol import prover_tpu as tp
    from zprize_tpu.protocol import keys_io
    from zprize_tpu.protocol.srs import device_srs
    from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol

    d = cache_dir(height, window_bits)
    os.makedirs(d, exist_ok=True)
    lay = MerkleLayout(height)
    n = lay.n

    t0 = time.time()
    pts, srs_lite, tau = device_srs(n + 8)
    print(f"# srs: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    dev_srs = tp.DevSRS.__new__(tp.DevSRS)
    dev_srs.points = pts
    dev_srs.ref = srs_lite
    dev_srs.size = n + 9

    cfg = tp.ProverConfig(msm_backend="device", msm_window_bits=window_bits)

    t0 = time.time()
    tr = TranscriptProtocol(b"Merkle tree")
    dev_pk, vk = preprocess_layout(lay, dev_srs, tr, cfg)
    print(f"# preprocess: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    keys_io.save_prover_key(dev_pk, os.path.join(d, "pk.npz"))
    keys_io.save_verifier_key(vk, os.path.join(d, "vk.json"))
    print(f"# persist keys: {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

    if run_warmup:
        warmup_subprocess(height, window_bits)
    return lay, dev_pk, vk, dev_srs


def warmup_subprocess(height, window_bits):
    """Warm the persistent compile cache by replaying the SCORED
    entrypoint in a fresh subprocess. Compile-cache keys depend on the
    process's trace history (the nested-jit lowering cache makes a
    program's StableHLO depend on what was lowered before it), so
    entries written by the setup process — which traced preprocessing
    first — are invisible to the driver's fresh scored process. A
    subprocess that runs exactly `python bench.py` traces in the scored
    order and writes exactly the keys the driver will look up."""
    import subprocess
    env = dict(os.environ)
    env["BENCH_HEIGHT"] = str(height)
    env["BENCH_WINDOW_BITS"] = str(window_bits)
    env["BENCH_DEADLINE"] = env.get("BENCH_SETUP_DEADLINE", "43200")
    env["BENCH_WARMUP"] = "1"
    env["BENCH_REPEAT"] = "1"
    t0 = time.time()
    r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, cwd=ROOT)
    print(f"# warmup subprocess rc={r.returncode} "
          f"({time.time()-t0:.1f}s)", file=sys.stderr, flush=True)


def load_setup(height, window_bits):
    from zprize_tpu.merkle.layout import MerkleLayout
    from zprize_tpu.protocol import prover_tpu as tp
    from zprize_tpu.protocol import keys_io
    from zprize_tpu.protocol.srs import device_srs

    d = cache_dir(height, window_bits)
    if not (os.path.exists(os.path.join(d, "pk.npz"))
            and os.path.exists(os.path.join(d, "vk.json"))):
        return None
    lay = MerkleLayout(height)
    pts, srs_lite, tau = device_srs(lay.n + 8)   # .srs_cache hit
    dev_srs = tp.DevSRS.__new__(tp.DevSRS)
    dev_srs.points = pts
    dev_srs.ref = srs_lite
    dev_srs.size = lay.n + 9
    dev_pk = keys_io.load_prover_key(os.path.join(d, "pk.npz"))
    vk = keys_io.load_verifier_key(os.path.join(d, "vk.json"))
    return lay, dev_pk, vk, dev_srs


def run_proof(height, window_bits, lay, dev_pk, vk, dev_srs,
              verify_proof=True, label="scored"):
    """Witness synthesis + gen_proof (the reference's 'gadget' + 'gen_proof'
    rows). Returns (witness_s, prove_s) or exits on verify failure."""
    from zprize_tpu.params import R_MOD
    from zprize_tpu.protocol import prover_tpu as tp
    from zprize_tpu.protocol.transcript_protocol import TranscriptProtocol
    from zprize_tpu.ref.prover import seed_transcript
    from zprize_tpu.fields.mont import FR

    cfg = tp.ProverConfig(msm_backend="device", msm_window_bits=window_bits)
    n = lay.n

    rng = np.random.default_rng(0)
    leaves_ints = [int.from_bytes(rng.bytes(31), "little")
                   for _ in range(lay.m_leaves)]
    leaves_dev = jnp.asarray(FR.to_mont_host(leaves_ints))

    tr = TranscriptProtocol(b"Merkle tree")
    seed_transcript(tr, vk)

    t0 = time.time()
    wires, root_val, _ = lay.witness(leaves_dev)
    jax.block_until_ready(wires[0])
    witness_s = time.time() - t0

    witness = tp.ProverWitness(
        wires, {lay.root_gate_pos: (-root_val) % R_MOD},
        jnp.ones((n,), dtype=bool))

    t0 = time.time()
    proof = tp.prove_tpu(witness, dev_pk, dev_srs, tr, cfg)
    prove_s = time.time() - t0
    print(f"# [{label}] witness: {witness_s:.2f}s  prove: {prove_s:.2f}s",
          file=sys.stderr, flush=True)

    if verify_proof:
        from zprize_tpu.ref.verifier import verify
        vtr = TranscriptProtocol(b"Merkle tree")
        seed_transcript(vtr, vk)
        ok = verify(vk, dev_srs.ref, proof, witness.public_inputs, vtr)
        print(f"# [{label}] verify: {'PASS' if ok else 'FAIL'}",
              file=sys.stderr, flush=True)
        if not ok:
            print(json.dumps({"metric": f"gen_proof_height{height}",
                              "value": -1, "unit": "s", "vs_baseline": 0}))
            sys.exit(1)
    return witness_s, prove_s


def persisted_setups():
    """[(height, window_bits)] of every complete .bench_cache entry."""
    out = []
    base = os.path.join(ROOT, ".bench_cache")
    if not os.path.isdir(base):
        return out
    for name in os.listdir(base):
        if not name.startswith("h"):
            continue
        try:
            h_s, w_s = name[1:].split("_w")
            h, w = int(h_s), int(w_s)
        except ValueError:
            continue
        d = os.path.join(base, name)
        if (os.path.exists(os.path.join(d, "pk.npz"))
                and os.path.exists(os.path.join(d, "vk.json"))):
            out.append((h, w))
    return sorted(out)


def record_scored(height, window_bits, witness_s, prove_s):
    """Persist the last successful scored timing next to the setup keys so
    the driver-facing height choice is evidence-based."""
    d = cache_dir(height, window_bits)
    tmp = os.path.join(d, "scored.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"witness_s": witness_s, "prove_s": prove_s,
                   "ts": time.time()}, f)
    os.replace(tmp, os.path.join(d, "scored.json"))


def scored_record(height, window_bits):
    path = os.path.join(cache_dir(height, window_bits), "scored.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def choose_height(avail, deadline):
    """Largest height whose LAST successful scored run fits comfortably in
    the deadline (execution + per-process warmup headroom); falls back to
    the largest persisted setup with no record, then the smallest."""
    best_known = None
    unknown = []
    for h, w in avail:
        rec = scored_record(h, w)
        if rec is None:
            unknown.append((h, w))
        elif rec["witness_s"] + rec["prove_s"] < deadline * 0.35:
            if best_known is None or h > best_known[0]:
                best_known = (h, w)
    if best_known:
        # prefer a proven height; an unproven LARGER setup is tried only
        # by explicit BENCH_HEIGHT
        return best_known
    if unknown:
        return max(unknown)
    return max(avail)


_EMITTED = False
_BEST = None        # (height, n, witness_s, prove_s, verified)


def _emit(height, n, witness_s, prove_s, verified):
    """Print THE one JSON line (first call wins)."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    gen_proof_s = witness_s + prove_s
    scaled_baseline = BASELINE_GEN_PROOF_S * n / (1 << BASELINE_LOG_N)
    print(json.dumps({
        "metric": f"gen_proof seconds (height-{height} Poseidon tree"
                  + ("" if verified else ", UNVERIFIED") + ")",
        "value": round(gen_proof_s, 3),
        "unit": "s",
        "vs_baseline": round(scaled_baseline / gen_proof_s, 4),
    }), flush=True)


def _watchdog(signum, frame):
    """Deadline fallback: never end the process with nothing parsed."""
    print("# BENCH_DEADLINE hit", file=sys.stderr, flush=True)
    if _BEST is not None:
        _emit(*_BEST)
    elif not _EMITTED:
        print(json.dumps({"metric": "gen_proof seconds (deadline, no prove "
                          "completed)", "value": -1, "unit": "s",
                          "vs_baseline": 0}), flush=True)
    sys.exit(0 if _BEST is not None else 1)


def main():
    global _BEST
    window_bits = int(os.environ.get("BENCH_WINDOW_BITS", "8"))
    verify_proof = os.environ.get("BENCH_VERIFY", "1") == "1"
    setup_only = len(sys.argv) > 1 and sys.argv[1] == "setup"

    # default height: the LARGEST persisted setup (climbing the ladder is
    # done offline via `bench.py setup`); env override wins; 6 if nothing
    # is persisted yet (falls back to an in-process build).
    deadline = int(os.environ.get("BENCH_DEADLINE", "720"))
    avail = persisted_setups()
    if os.environ.get("BENCH_HEIGHT"):
        height = int(os.environ["BENCH_HEIGHT"])
    elif avail and not setup_only:
        height, window_bits = choose_height(avail, deadline)
    else:
        height = 6

    if not setup_only:
        signal.signal(signal.SIGALRM, _watchdog)
        signal.alarm(deadline)

    from zprize_tpu.merkle.layout import MerkleLayout  # noqa: F401 (early import)

    if setup_only:
        state = load_setup(height, window_bits)
        if state is not None:
            # keys already persisted (resumed setup): only the compile
            # warm-up is left to do — in a scored-order subprocess
            warmup_subprocess(height, window_bits)
        else:
            build_setup(height, window_bits)
        print(f"# setup complete for h{height} w{window_bits}",
              file=sys.stderr)
        return

    state = load_setup(height, window_bits)
    if state is None:
        print("# no persisted setup found -> building (unscored)",
              file=sys.stderr, flush=True)
        state = build_setup(height, window_bits)
    lay, dev_pk, vk, dev_srs = state
    n = lay.n
    print(f"# height={height} gates={lay.n_real} n=2^{n.bit_length()-1}",
          file=sys.stderr, flush=True)

    # criterion-style warm-up iteration (pnp_bench.rs warms before the
    # scored loop): traces/lowers the jitted round programs and hits the
    # persistent compile cache so the scored run measures execution.
    if os.environ.get("BENCH_WARMUP", "1") == "1":
        w_s, p_s = run_proof(height, window_bits, lay, dev_pk, vk, dev_srs,
                             verify_proof=False, label="warmup")
        # deadline fallback only: a warm-up time is better than no number
        _BEST = (height, n, w_s, p_s, False)
        # insurance line: if the driver's budget ends before the scored
        # prove finishes, the LAST parseable JSON line it sees is this
        # warmup figure (UNVERIFIED) instead of nothing. The scored line
        # printed later supersedes it.
        scaled = BASELINE_GEN_PROOF_S * n / (1 << BASELINE_LOG_N)
        g = w_s + p_s
        print(json.dumps({
            "metric": f"gen_proof seconds (height-{height} Poseidon tree"
                      ", UNVERIFIED warmup)",
            "value": round(g, 3), "unit": "s",
            "vs_baseline": round(scaled / g, 4)}), flush=True)

    repeat = int(os.environ.get("BENCH_REPEAT", "1"))
    for r in range(repeat):
        witness_s, prove_s = run_proof(height, window_bits, lay, dev_pk, vk,
                                       dev_srs, verify_proof,
                                       label=f"scored[{r}]")
        if r == 0:
            # emit THE scored JSON line immediately — repeats and summary
            # tables must never stand between a good prove and a parsed
            # BENCH_rNN (two rounds died with rc=124 and nothing captured)
            _emit(height, n, witness_s, prove_s, verify_proof)
            signal.alarm(0)
            if verify_proof:
                record_scored(height, window_bits, witness_s, prove_s)
    gen_proof_s = witness_s + prove_s

    # reference-style summary table (zprize_bench.rs four-column shape)
    print("# | stage            | seconds |", file=sys.stderr)
    print(f"# | gadget (witness) | {witness_s:7.2f} |", file=sys.stderr)
    print(f"# | gen_proof        | {prove_s:7.2f} |", file=sys.stderr)
    print(f"# | total            | {gen_proof_s:7.2f} |", file=sys.stderr)


if __name__ == "__main__":
    main()
