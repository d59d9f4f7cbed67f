"""Persistent-compile-cache policy, scoped to the TPU backend.

The repo's `.jax_cache/` rides along with the working tree between the
builder host and the bench host. TPU executables are target-specific and
portable between identical chips, so caching them is a big win (the axon
remote compiler costs minutes per large program). XLA:CPU AOT results,
however, bake the *compiling machine's* CPU features into the executable,
and jax's cache key does NOT include host CPU features — a CPU entry
written on one machine is read (and rejected, loudly, per entry, via
`cpu_aot_loader.cc` errors, or worse: SIGILL) on another.

Fix: fence the CPU backend out of the persistent cache entirely by
wrapping `jax._src.compiler.compile_or_get_cached` — cpu compiles go
straight to `backend_compile_and_load`, every other backend keeps the
normal cached path. (jax 0.9.0 has no per-backend cache config; both
jit call sites in `interpreters/pxla.py` resolve the function through the
module attribute, so the patch is complete.)
"""

import os

import jax

_FENCED = False


def _install_cpu_fence():
    global _FENCED
    if _FENCED:
        return
    import jax._src.compiler as _comp

    _orig = _comp.compile_or_get_cached

    def _fenced(backend, computation, devices, compile_options,
                host_callbacks, executable_devices, pgle_profiler=None):
        if backend.platform == "cpu":
            return _comp.backend_compile_and_load(
                backend, computation, executable_devices, compile_options,
                host_callbacks)
        if os.environ.get("ZPRIZE_CACHE_DEBUG") == "1":
            try:
                import hashlib
                from jax._src import cache_key as _ck
                ho = hashlib.sha256()
                _ck._hash_serialized_compile_options(ho, compile_options)
                hc = hashlib.sha256()
                _ck._hash_computation(hc, computation,
                                      _ck.IgnoreCallbacks.NO)
                name = "?"
                try:
                    from jax._src.lib.mlir import ir as _ir
                    name = _ir.StringAttr(
                        computation.operation.attributes["sym_name"]).value
                except Exception:
                    pass
                print(f"# CACHEDBG {name} opts={ho.hexdigest()[:12]} "
                      f"comp={hc.hexdigest()[:12]}", flush=True)
            except Exception as e:
                print(f"# CACHEDBG failed: {e}", flush=True)
        # the axon remote-compile tunnel occasionally drops mid-response
        # ("response body closed before all bytes were read"); a large
        # program compile is minutes of sunk cost — retry transient
        # failures instead of killing the prove/bench process
        import time as _time
        last = None
        for attempt in range(4):
            try:
                return _orig(backend, computation, devices, compile_options,
                             host_callbacks, executable_devices,
                             pgle_profiler)
            except Exception as e:  # jax.errors.JaxRuntimeError etc.
                msg = str(e)
                transient = ("read body" in msg or "remote_compile" in msg
                             or "UNAVAILABLE" in msg
                             or "Connection" in msg)
                if not transient:
                    raise
                last = e
                print(f"# remote compile transient failure "
                      f"(attempt {attempt + 1}/4): {msg[:120]}",
                      flush=True)
                _time.sleep(5.0 * (attempt + 1))
        raise last

    if os.environ.get("ZPRIZE_CACHE_DEBUG") == "1":
        _orig_key = _comp._get_cache_key

        def _dbg_key(*a, **kw):
            k = _orig_key(*a, **kw)
            print(f"# CACHEDBG final_key {k}", flush=True)
            return k

        _comp._get_cache_key = _dbg_key

    _comp.compile_or_get_cached = _fenced
    _FENCED = True


def configure(root=None, min_compile_secs=0.0):
    """Enable the persistent compile cache at <root>/.jax_cache for
    non-CPU backends only. Call before any tracing/compilation."""
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _install_cpu_fence()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # persist EVERYTHING (TPU-side): eager glue ops (pad/slice/stack around
    # the fused programs) compile in ~0.3-0.5s each through the axon compile
    # helper, and a few hundred of them re-compile every process when only
    # >0.5s entries were cached
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)


def disable():
    """Turn the persistent cache off entirely (pure-CPU processes: tests,
    dryruns)."""
    _install_cpu_fence()
    jax.config.update("jax_enable_compilation_cache", False)
