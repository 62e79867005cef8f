"""Flagship benchmark: viscous Burgers d=128, N=128, T=5.9, nnGParareal m=18.

This is the headline configuration of BASELINE.md section 4 (reference
Burgers.py:27-57,117-122): epsilon=5e-7, Ng=4N, Nf=1e4*Ng, RK1 coarse /
RK8 fine, [-1,1]-normalized, nn=18. The reference achieved K=14 and
speedup 8.08x over the estimated serial fine solve on a 3-node, 141-core
MPI cluster; here the whole run executes on however many TPU chips are
visible (one fused SPMD program; slices are vector lanes).

Speedup is computed exactly like the reference's analysis scripts
(BASELINE.md: S = est_serial / runtime with est_serial =
F_time_serial_avg / K * N), so vs_baseline is apples-to-apples.

Prints ONE JSON line:
  {"metric": ..., "value": S, "unit": "x", "vs_baseline": S / 8.08}
"""

import json
import sys
import time


BASELINE_SPEEDUP = 8.08  # BASELINE.md section 4, T=5.9, nnGParareal
BASELINE_K = 14


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import numpy as np
    from nngparareal_tpu.systems import Burgers
    from nngparareal_tpu.solver import RKSolver
    from nngparareal_tpu.driver import Parareal
    from nngparareal_tpu.reporting import est_serial, calc_speedup

    N = 128
    T = 5.9
    Ng_per, Nf_per = 4, 10000 * 4  # totals Ng=4N, Nf=1e4*Ng (Burgers.py:30-31)

    ode = Burgers(d_x=128, normalization="-11")
    f = ode.get_vector_field()
    solver = RKSolver(f, Ng=Ng_per, Nf=Nf_per, G="RK1", F="RK8")
    p = Parareal(ode, solver, [0.0, T], N, epsilon=5e-7, verbose=None)

    # grid hyperopt: the TPU-native deterministic theta search (same
    # candidate support as the reference's NM random starts; K parity
    # verified on the paper systems — see tests/test_parareal.py)
    out = p.run(model="nngp", nn=18, seed=45, optimizer="grid")

    runtime = out["timings"]["runtime"]
    serial_est = est_serial(out, N)
    speedup = calc_speedup(out, N=N)

    info = {
        "K": out["k"],
        "converged": bool(out["converged"]),
        "runtime_s": round(runtime, 3),
        "est_serial_s": round(serial_est, 3),
        "F_time_s": round(out["timings"]["F_time"], 3),
        "G_time_s": round(out["timings"]["G_time"], 3),
        "mdl_tot_s": round(out["timings"]["mdl_tot_t"], 3),
        "overhead_s": round(out["timings"].get("overhead_t", 0.0), 3),
        "jit_compile_s": round(out["timings"].get("warmup_t", 0.0), 3),
        "total_wall_s": round(out["timings"].get("total_wall", 0.0), 3),
        "baseline": {"K": BASELINE_K, "speedup": BASELINE_SPEEDUP},
    }
    print(json.dumps({"detail": info}), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "burgers128_nngp_speedup_vs_serial_fine",
                "value": round(float(speedup), 4),
                "unit": "x",
                "vs_baseline": round(float(speedup) / BASELINE_SPEEDUP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
