"""Burgers K-vs-m seed-spread study on the TPU (reference
Burgers_perf_across_m.py:100-135).

The reference measured K and speedup for m in {11..30} x 100 random
seeds on the cluster (its robustness evidence: K median 17-19 at m=18,
T=5.9). Here a reduced grid runs on one chip; one Parareal/solver pair
per m so the fine fan-out jit is compiled once per m and reused across
seeds (the sweep recompiles per run — that cost is reported in the
pickle as warmup_t).

Usage: python scripts/burgers_across_m_tpu.py [T] [seeds-per-m]
Appends rows to results/burgers_across_m_T{T}.pkl as it goes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("ACROSSM_CPU") == "1":
    # seed-band extension runs ride the CPU while the chip is busy/down
    # (the env JAX_PLATFORMS pin is ignored on this box — go through the
    # live config, as tests/conftest.py does)
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

try:
    from nngparareal_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache(verbose=True)
except Exception as _e:
    print(f"[compile-cache] enable failed: {_e!r}", flush=True)

from nngparareal_tpu.systems import Burgers
from nngparareal_tpu.solver import RKSolver
from nngparareal_tpu.driver import Parareal
from nngparareal_tpu.reporting import calc_speedup


def main():
    T = float(sys.argv[1]) if len(sys.argv) > 1 else 5.9
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    optimizer = sys.argv[3] if len(sys.argv) > 3 else "grid"
    # optional: restrict to one m and start seeds at an offset (to extend
    # the NM seed band without re-running finished seeds)
    ms = [int(sys.argv[4])] if len(sys.argv) > 4 else [12, 15, 18, 21, 25, 30]
    seed0 = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    N = 128
    # locked append (never clobber, never race): the CPU seed chain and
    # the chip queue can both extend this study concurrently; each new
    # row is merged under an fcntl lock against the CURRENT disk state
    # (a load-once/overwrite-each-store scheme would silently drop the
    # other process's rows)
    import fcntl
    import pickle as _pickle

    pkl = os.path.join("results", f"burgers_across_m_T{T}.pkl")
    lockpath = pkl + ".lock"

    def append_row(row):
        with open(lockpath, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            disk = []
            if os.path.exists(pkl):
                with open(pkl, "rb") as fh:
                    disk = _pickle.load(fh)
            disk.append(row)
            tmp = pkl + ".tmp"
            with open(tmp, "wb") as fh:
                _pickle.dump(disk, fh)
            os.replace(tmp, pkl)
    backend = None  # resolved lazily after the first run (jax backend)
    ode = Burgers(d_x=N, normalization="-11")
    f = ode.get_vector_field()
    for m in ms:
        solver = RKSolver(f, Ng=4, Nf=40000, G="RK1", F="RK8")
        p = Parareal(ode, solver, [0.0, T], N, epsilon=5e-7, verbose=None)
        # the grid path draws no RNG (theta0 restarts exist only under NM),
        # so grid-mode K is seed-invariant by construction: run it once
        seeds = (range(seed0, seed0 + n_seeds) if optimizer != "grid"
                 else range(1))
        for seed in seeds:
            try:
                out = p.run(model="nngp", nn=m, seed=seed,
                            optimizer=optimizer)
                if backend is None:
                    import jax

                    backend = jax.default_backend()
                append_row({
                    "m": m, "seed": seed, "k": out["k"],
                    "converged": out["converged"],
                    "runtime": out["timings"]["runtime"],
                    "warmup_t": out["timings"].get("warmup_t", 0.0),
                    "speedup": float(calc_speedup(out, N=N)),
                    "optimizer": optimizer, "backend": backend,
                })
                print(f"m={m} seed={seed} K={out['k']} "
                      f"rt={out['timings']['runtime']:.1f}s", flush=True)
            except Exception as e:  # record failures as data rows
                append_row({"m": m, "seed": seed, "error": str(e)})
                print(f"m={m} seed={seed} ERROR {e}", flush=True)


if __name__ == "__main__":
    main()
