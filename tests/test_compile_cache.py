"""Persistent-compile-cache enablement (utils/compile_cache.py).

The round-4 flagship bench paid a 612.9 s cold compile for an 11 s solve
with jax_compilation_cache_dir set (VERDICT r4 weak #2) because (a) the
axon platform is off jax's persistent-cache allowlist and (b) enable()'s
get_backend call hit the lazy `jax.extend` submodule with an
AttributeError that the rescue except swallowed whenever the caller
enabled the cache before importing anything that loads jax.extend —
which is exactly what bench.py and run_resumable do. These tests pin the
call order that broke.
"""

import subprocess
import sys

CLEAN_ORDER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
from nngparareal_tpu.utils.compile_cache import enable
ok = enable(verbose=True, path={path!r})
print("ENABLE_RESULT", ok)
"""


def _run(code, tmp_path):
    repo = __file__.rsplit("/", 2)[0]
    src = code.format(repo=repo, path=str(tmp_path / "cache"))
    out = subprocess.run(
        [sys.executable, "-c", src], capture_output=True, text=True,
        timeout=240,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_enable_before_any_other_import(tmp_path):
    # the bench.py / run_resumable call order: enable() first, package later
    stdout = _run(CLEAN_ORDER, tmp_path)
    assert "ENABLE_RESULT True" in stdout, stdout
    # and it must SAY so (silent False was the round-4 failure mode)
    assert "[compile-cache]" in stdout, stdout


def test_enable_cross_process_hit(tmp_path):
    # two fresh processes, same cache dir: the second must hit the cache.
    # enable() keeps a 0.2 s write floor for production; a unit-test-sized
    # program compiles under it and would never be written, so zero the
    # floor here — the mechanism under test is the cross-process hit, not
    # the floor. The unrolled matmul chain inflates HLO so XLA compile
    # (t1) dominates deserialization (t2) well past timing noise.
    code = CLEAN_ORDER + r"""
import os, time, jax, jax.numpy as jnp
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

@jax.jit
def prog(u, w):
    for i in range(48):
        u = jnp.tanh(u @ w + (0.01 * i) * u)
    return u.sum()

u = jnp.ones((128, 128), jnp.float32)
w = jnp.eye(128, dtype=jnp.float32)
t0 = time.perf_counter()
prog.lower(u, w).compile()
print("COMPILE_S", time.perf_counter() - t0)
print("CACHE_FILES", sum(len(fs) for _, _, fs in os.walk({path!r})))
"""
    first = _run(code, tmp_path)
    # the write must have landed before the timing claim means anything
    n_entries = int(first.split("CACHE_FILES")[1].strip().split()[0])
    assert n_entries >= 1, first
    second = _run(code, tmp_path)
    t1 = float(first.split("COMPILE_S")[1].strip().split()[0])
    t2 = float(second.split("COMPILE_S")[1].strip().split()[0])
    # cache hit: deserialization is far cheaper than XLA compile; 2x is a
    # conservative bound robust to 1-core timing noise
    assert t2 < t1 / 2, (t1, t2)
