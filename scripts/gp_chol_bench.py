"""On-chip crossover measurement: full-GP NLL scoring via row-major XLA
cholesky (vmapped gp_nll) vs the blocked lane-major path (nll_lanes_big).

Decides where GParareal(score_lanes=True) should cut over: the unrolled
lane kernels win ~100x for tiny m (BENCHMARKS microbench table), XLA's
native blocked cholesky should win for large m where MXU-blocked
factorization amortises. Grams here are the full-GP shapes: B candidates
(one grid-chunk's worth) sharing one (m, m) squared-distance matrix.

Usage: python scripts/gp_chol_bench.py [f64|f32] [m ...]
Prints one line per (m, path): steady-state seconds per call, synced via
host fetch (the relay elides block_until_ready for some executables).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from nngparareal_tpu.ops import gp as gpops
from nngparareal_tpu.ops.gp_lanes import (
    nll_lanes, nll_lanes_big, k_se_linear_lanes, _LANES_UNROLL_M,
)


def bench(fn, args, reps=3):
    np.asarray(fn(*args))  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    dt = jnp.float32 if (len(sys.argv) > 1 and sys.argv[1] == "f32") else None
    ms = [int(a) for a in sys.argv[2:]] or [32, 64, 128, 256, 512]
    B = 169  # one 13x13 grid pass per task
    rng = np.random.default_rng(0)
    for m in ms:
        X = jnp.asarray(rng.normal(size=(m, 3)))
        y = jnp.asarray(rng.normal(size=(m,)))
        mask = jnp.ones(m)
        sqd = gpops.pairwise_sq_dists(X, X)
        theta = jnp.asarray(10.0 ** rng.uniform(-2, 1, (B, 2)))
        jp = jnp.full(B, -13.0)
        if dt is not None:
            sqd, y, mask = sqd.astype(dt), y.astype(dt), mask.astype(dt)
            theta, jp = theta.astype(dt), jp.astype(dt)

        @jax.jit
        def row_major(sqd, y, theta, jp, mask):
            return jax.vmap(
                lambda t: gpops.nll_from_sqd(
                    sqd, y, t, jp[0], mask, gpops.k_se_linear
                )
            )(theta)

        @jax.jit
        def lanes_big(sqd, y, theta, jp, mask):
            return nll_lanes_big(sqd, y[:, None], theta, jp, mask,
                                 kernel=k_se_linear_lanes)

        args = (sqd, y, theta, jp, mask)
        t_row = bench(row_major, args)
        print(f"m={m:4d} B={B} row-major   {t_row * 1e3:9.2f} ms", flush=True)
        t_blk = bench(lanes_big, args)
        print(f"m={m:4d} B={B} lanes-block {t_blk * 1e3:9.2f} ms", flush=True)
        if m <= _LANES_UNROLL_M:
            @jax.jit
            def lanes_unr(sqd, y, theta, jp, mask):
                return nll_lanes(sqd, y[:, None], theta, jp, mask,
                                 kernel=k_se_linear_lanes)
            t_unr = bench(lanes_unr, args)
            print(f"m={m:4d} B={B} lanes-unrl  {t_unr * 1e3:9.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
