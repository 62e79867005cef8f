"""Figure-3 equivalent: K distribution across m and seeds, 6 ODE systems.

Reference Figure_3.py:54-129 sweeps nn in {adaptive, 11..16} x seeds
45-49 x eps {5e-7, 5e-9} with per-system early stops and stores the K
grid (pickles NNGP_all_but_pend / NNGP_pend). This driver runs the same
study shape on our stack: the deterministic grid hyperopt once per
(system, m) — it draws no RNG, so its seed spread is identically zero —
plus the NM mode (the reference's optimizer) for every seed.

Usage: python scripts/figure3_sweep.py [eps] [seeds...]
Appends to results/figure3_k_grid.json keyed by
(system, m, optimizer, seed, eps); re-runs skip completed keys.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FIG3_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from nngparareal_tpu import (
    FHNODE, Rossler, Hopf, DblPend, Brusselator, Lorenz, Config, RKSolver,
    Parareal,
)

# (name, ctor, N-arg, early_stop) — early stops from reference
# Figure_3.py:58 (e_stops = [10, 18, 16, 24, 17]) + pend 20
SYSTEMS = [
    ("FHN_ODE", FHNODE, None, 10),
    ("Rossler", Rossler, None, 18),
    ("Hopf", Hopf, 32, 16),
    ("Brusselator", Brusselator, None, 24),
    ("Lorenz", Lorenz, None, 17),
    ("DblPend", DblPend, None, 20),
]

MS = ["adaptive", 11, 12, 13, 14, 15, 16]

OUT = "results/figure3_k_grid.json"


def main():
    eps = float(sys.argv[1]) if len(sys.argv) > 1 else 5e-7
    seeds = [int(s) for s in sys.argv[2:]] or [45, 46, 47, 48, 49]

    rows = []
    if os.path.exists(OUT):
        with open(OUT) as fh:
            rows = json.load(fh)
    done = {(r["system"], str(r["m"]), r["optimizer"], r["seed"], r["eps"])
            for r in rows if "K" in r}

    for name, ctor, Narg, e_stop in SYSTEMS:
        ode = ctor(normalization="-11")
        cfg = Config(ode, N=Narg).get()
        solver = RKSolver(
            ode.get_vector_field(), cfg["Ng"], cfg["Nf"], G=cfg["G"],
            F=cfg["F"],
        )
        p = Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=eps,
                     verbose=None)
        for m in MS:
            jobs = [("grid", seeds[0])] + [("nm", s) for s in seeds]
            for opt, seed in jobs:
                key = (name, str(m), opt, seed, eps)
                if key in done:
                    continue
                t0 = time.time()
                try:
                    out = p.run(model="nngp", nn=m, optimizer=opt, seed=seed,
                                early_stop=e_stop,
                                cstm_mdl_name=f"{m}-{opt}-{seed}")
                    row = {
                        "system": name, "N": cfg["N"], "m": m,
                        "optimizer": opt, "seed": seed, "eps": eps,
                        "K": out["k"], "converged": bool(out["converged"]),
                        "wall_s": round(time.time() - t0, 1),
                    }
                except Exception as e:
                    row = {"system": name, "N": cfg["N"], "m": m,
                           "optimizer": opt, "seed": seed, "eps": eps,
                           "error": str(e)[:150],
                           "wall_s": round(time.time() - t0, 1)}
                print(row, flush=True)
                rows.append(row)
                os.makedirs("results", exist_ok=True)
                with open(OUT, "w") as fh:
                    json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
