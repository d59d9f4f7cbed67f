"""Disk-backed AOT program store — skips Python tracing+lowering for the
fused prover programs in warm processes.

Per-process cost model on the tunneled TPU runtime (measured round 4):
execution of a warm h6 prove is ~7 s, but a fresh process pays ~380 s of
pure-Python tracing before its first proof — the limb kernels trace fast
now, but ~80 distinct pallas shapes x ~3-4 s adds up. `jax.export`
serializes the traced+lowered StableHLO; deserializing is ~ms, and the
XLA compile of the embedded module hits the persistent compile cache
(stable keys: the serialized bytes are identical in every process, which
also kills the trace-order key instability documented in
`protocol/prover_tpu.py`).

Store layout: .bench_cache/aot/<name>-<key>.jaxexp, key =
sha256(avals, statics, code-version). Code-version is a hash over the
zprize_tpu sources that shape these programs, so edits invalidate
automatically. Any failure falls back to the plain jit call.
"""

import hashlib
import os
import threading

import jax

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DIR = os.path.join(_ROOT, ".bench_cache", "aot")

_SRC_FILES = [
    "fields/limbmath.py", "fields/pkern.py", "fields/mont.py",
    "fields/frvec.py", "ops/ntt.py", "ops/poly.py", "ops/msm.py",
    "curve/g1.py", "protocol/widgets_jax.py", "protocol/prover_tpu.py",
]

_code_version = None
_lock = threading.Lock()
_registered = False


def _register_serializations():
    """Export serialization for the repo's custom pytree types (their
    auxdata is plain Python ints/bools/tuples — pickle round-trips it)."""
    global _registered
    if _registered:
        return
    import pickle
    from jax import export as jexport
    from .ops.ntt import NttPlan, SubcosetTables
    from .protocol.prover_tpu import DevProverKey
    for cls, name in ((NttPlan, "zprize.NttPlan"),
                      (SubcosetTables, "zprize.SubcosetTables"),
                      (DevProverKey, "zprize.DevProverKey")):
        try:
            jexport.register_pytree_node_serialization(
                cls, serialized_name=name,
                serialize_auxdata=pickle.dumps,
                deserialize_auxdata=pickle.loads)
        except ValueError:
            pass  # already registered (re-import)
    _registered = True


def code_version() -> str:
    global _code_version
    if _code_version is None:
        h = hashlib.sha256()
        base = os.path.dirname(os.path.abspath(__file__))
        for rel in _SRC_FILES:
            try:
                with open(os.path.join(base, rel), "rb") as f:
                    h.update(f.read())
            except OSError:
                pass
        h.update(jax.__version__.encode())
        _code_version = h.hexdigest()[:16]
    return _code_version


def enabled() -> bool:
    """AOT replay is only valid on the real TPU backend (exports embed
    platform-specific pallas custom calls)."""
    if os.environ.get("ZPRIZE_AOT", "1") != "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _spec(x):
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return ("a", tuple(x.shape), str(x.dtype))
    return ("s", repr(x))


def _key(name, args, statics):
    h = hashlib.sha256()
    h.update(code_version().encode())
    h.update(name.encode())
    leaves, treedef = jax.tree.flatten(args)
    h.update(str(treedef).encode())
    for leaf in leaves:
        h.update(repr(_spec(leaf)).encode())
    h.update(repr(sorted(statics.items())).encode())
    return h.hexdigest()[:24]


class AotFn:
    """Wraps a jitted fn with a serialize-to-disk export cache. Static
    arguments must be passed as KEYWORDS (they become part of the key and
    are baked into the export)."""

    def __init__(self, name, jit_fn):
        self.name = name
        self.jit_fn = jit_fn
        self._mem = {}

    def _plain(self, args):
        """True when AOT replay must be skipped: inside another trace, or
        on sharded (meshed) inputs — exports are keyed on shapes only."""
        for leaf in jax.tree.leaves(args):
            if isinstance(leaf, jax.core.Tracer):
                return True
            if isinstance(leaf, jax.Array) and not isinstance(
                    leaf.sharding, jax.sharding.SingleDeviceSharding):
                return True
        return False

    def __call__(self, *args, **statics):
        if not enabled() or self._plain(args):
            return self.jit_fn(*args, **statics)
        try:
            return self._call_aot(args, statics)
        except Exception as e:  # pragma: no cover — always fall back
            print(f"# aot fallback for {self.name}: "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            return self.jit_fn(*args, **statics)

    def _call_aot(self, args, statics):
        from jax import export as jexport
        _register_serializations()
        k = _key(self.name, args, statics)
        exp = self._mem.get(k)
        if exp is None:
            path = os.path.join(_DIR, f"{self.name}-{k}.jaxexp")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    exp = jexport.deserialize(bytearray(f.read()))
            else:
                exp = jexport.export(self.jit_fn)(*args, **statics)
                os.makedirs(_DIR, exist_ok=True)
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(exp.serialize())
                os.replace(tmp, path)
            with _lock:
                self._mem[k] = exp
        return exp.call(*args)
