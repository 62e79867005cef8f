"""nnGP-time on-chip crash bisect + Lorenz study (VERDICT r2 item 4).

Round 2's full-config Lorenz NNGPTime run died on the TPU with a
JaxRuntimeError (UNAVAILABLE / kernel fault) inside the driver's first
_block; suspected: the refinement-chain gather sizes. This script walks
ladder configs from the known-good CPU gate upward, printing K for each,
so the failing (reps, nn_iters) combination — if any — is identified on
the way to the reference's full setting (nn=11, n_restarts=20,
nn_iters=20, reps=10; reference nnGPara_with_time.py:654-657).

Usage: python scripts/nngp_time_probe.py [ladder|full] [system]
env NNGPTIME_CPU=1 forces the CPU backend (reference-arithmetic f64).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("NNGPTIME_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from nngparareal_tpu import Lorenz, Config, RKSolver, Parareal

LADDER = [
    dict(reps=2, nn_iters=2, n_restarts=2, nm_max_iters=80),
    dict(reps=4, nn_iters=5, n_restarts=5, nm_max_iters=150),
    dict(reps=10, nn_iters=10, n_restarts=10, nm_max_iters=150),
    dict(reps=10, nn_iters=20, n_restarts=20, nm_max_iters=150),
]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "ladder"
    ode = Lorenz(normalization="-11")
    cfg = Config(ode).get()
    solver = RKSolver(
        ode.get_vector_field(), cfg["Ng"], cfg["Nf"], G=cfg["G"], F=cfg["F"]
    )
    configs = LADDER if mode == "ladder" else [LADDER[-1]]
    for kw in configs:
        p = Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=5e-7,
                     verbose=None)
        t0 = time.time()
        try:
            out = p.run(model="nngp_time", nn=11, seed=45, fatol=1e-1,
                        xatol=1e-1, **kw)
            print({"cfg": kw, "K": out["k"],
                   "converged": bool(out["converged"]),
                   "runtime_s": round(out["timings"]["runtime"], 1),
                   "wall_s": round(time.time() - t0, 1)}, flush=True)
        except Exception as e:
            print({"cfg": kw, "error": str(e)[:250],
                   "wall_s": round(time.time() - t0, 1)}, flush=True)
            raise SystemExit(1)  # chip likely wedged; stop the ladder


if __name__ == "__main__":
    main()
