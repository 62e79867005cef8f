"""On-chip persistent-compile-cache probe (round-5 VERDICT item 6).

Verifies the utils/compile_cache.enable() force-enable actually makes the
axon backend read/write the persistent cache:

  1. enable() and report whether the cache is live for this backend
  2. compile a representative mid-size program, timing .lower().compile()
  3. re-compile the same program in THIS process (in-memory hit; baseline)
  4. print the wall — run the script twice: the second process's step-2
     time is the cross-process verdict (hit = sub-second + "persistent
     cache hit" in JAX logs; miss = same as cold)

Exit code 0 always (diagnostic); the decision consumer is the queue log.
"""

import logging
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nngparareal_tpu.utils.compile_cache import enable

logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.basicConfig(level=logging.INFO)


def main():
    live = enable(verbose=True)
    print(f"[cache-probe] cache live: {live}", flush=True)
    dev = jax.devices()[0]
    print(f"[cache-probe] backend: {dev.platform} {dev.device_kind}",
          flush=True)

    # representative program: batched RK-style scan + matmul mix, big
    # enough that XLA compile is non-trivial, no Pallas (probe the
    # baseline path first)
    def step(c, _):
        u, w = c
        u = jnp.tanh(u @ w + 0.1 * u)
        return (u, w), u.sum()

    @jax.jit
    def prog(u, w):
        (u, _), s = jax.lax.scan(step, (u, w), None, length=64)
        return u, s

    u = jnp.ones((256, 256), jnp.float32)
    w = jnp.eye(256, dtype=jnp.float32)

    t0 = time.perf_counter()
    c = prog.lower(u, w).compile()
    t1 = time.perf_counter()
    print(f"[cache-probe] first compile: {t1 - t0:.3f}s", flush=True)

    out = c(u, w)
    print(f"[cache-probe] exec ok: {float(out[1]):.3f}", flush=True)

    t0 = time.perf_counter()
    prog.lower(u, w).compile()
    t1 = time.perf_counter()
    print(f"[cache-probe] recompile same process: {t1 - t0:.3f}s",
          flush=True)


if __name__ == "__main__":
    main()
