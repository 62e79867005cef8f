"""Hopf N=512 nnGParareal end-to-end on TPU (the paper's headline scaling
row: K=19, speedup 21.17 on 541 cluster cores — BASELINE.md section 2)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

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
    print({k: round(v, 2) for k, v in tm.items() if np.isscalar(v)}, flush=True)
    print("est_serial", round(est_serial(out, N), 1),
          "SPEEDUP", round(calc_speedup(out, N=N), 2),
          "wall", round(time.time() - t0, 1), flush=True)


if __name__ == "__main__":
    main()
