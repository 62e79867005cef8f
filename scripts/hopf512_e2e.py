"""Hopf N=512 nnGParareal end-to-end on TPU (the paper's headline scaling
row: K=19, speedup 21.17 on 541 cluster cores — BASELINE.md section 2)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# force-enable the persistent cache for the allowlist-excluded axon relay
# (setting jax_compilation_cache_dir alone is a no-op there — see
# utils/compile_cache docstring)
from nngparareal_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache(verbose=True)

import numpy as np
import jax.numpy as jnp

from nngparareal_tpu.systems import Hopf
from nngparareal_tpu.systems.configs import Config
from nngparareal_tpu.solver import RKSolver
from nngparareal_tpu.driver import Parareal
from nngparareal_tpu.reporting import est_serial, calc_speedup


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    early = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    fine = sys.argv[3] if len(sys.argv) > 3 else "f64"  # f64 | ds | pallas
    min_rows = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    ode = Hopf(normalization="-11")
    cfg = Config(ode, N=N).get()
    # scaling driver multiplies Nf x10000 and pages fine solves in
    # Nf/N/25 chunks (reference Hopf.py:65-69)
    Nf = cfg["Nf"] * 10000
    fine_kw = {}
    if fine in ("ds", "pallas", "auto"):
        fine_kw = dict(fine_ds=ode.get_ds_vector_field(), fine=fine)
    if min_rows > 1:
        fine_kw["fine_min_rows"] = min_rows
    solver = RKSolver(ode.get_vector_field(), cfg["Ng"], Nf,
                      G=cfg["G"], F=cfg["F"], thresh=max(Nf // 25, 1),
                      **fine_kw)
    p = Parareal(ode, solver, cfg["tspan"], N, epsilon=5e-7, verbose=None)
    t0 = time.time()
    out = p.run(model="nngp", nn=15, n_restarts=2, optimizer="grid",
                seed=45, early_stop=early or None)
    tm = out["timings"]
    print("K =", out["k"], "converged", out["converged"], flush=True)
    print("conv_int", out["conv_int"], flush=True)
    # numeric scalars only: timings also carries strings (sync_mode,
    # sweep_mode) and dicts (warmup_split) — round() on those threw and
    # cost the round-5 hopf128 row its timing printout
    print({k: round(float(v), 2) for k, v in tm.items()
           if isinstance(v, (int, float, np.floating, np.integer))},
          flush=True)
    row = dict(
        system="Hopf", N=N, fine=fine, min_rows=min_rows,
        K=int(out["k"]), converged=bool(out["converged"]),
        runtime_s=round(float(tm["runtime"]), 3),
        est_serial_s=round(float(est_serial(out, N)), 1),
        speedup=round(float(calc_speedup(out, N=N)), 2),
        warmup_t=round(float(tm.get("warmup_t", 0.0)), 1),
        wall_s=round(time.time() - t0, 1),
    )
    print("est_serial", row["est_serial_s"], "SPEEDUP", row["speedup"],
          "wall", row["wall_s"], flush=True)
    # persist: a crashed print must not lose a half-hour chip run again
    import json
    path = "results/hopf_scaling_rows.json"
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    rows.append(row)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
