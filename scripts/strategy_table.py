"""Neighbour-selection strategy comparison (reference nnGPara_with_time.py
:219-244, pickle nngptime_diff_subsets2): K for each of the 6 selection
strategies {nn, col+rnd, col_only, row_col, row, col_full} on the 6 ODE
systems, nn=16, eps=5e-7. The reference's own K table is extracted in
results/ref_strategy_k.json; this runs ours (models/nngp.py strategy=...)
and appends rows to results/strategy_k.json.

Usage: python scripts/strategy_table.py [system ...]   (default: all)
env STRATEGY_CPU=1 forces the CPU backend.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("STRATEGY_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from nngparareal_tpu import (
    FHNODE, Rossler, Hopf, DblPend, Brusselator, Lorenz, Config, RKSolver,
    Parareal,
)

SYSTEMS = {
    "FHN_ODE": (FHNODE, None), "Rossler": (Rossler, None),
    "Hopf": (Hopf, 32), "Brusselator": (Brusselator, None),
    "Lorenz": (Lorenz, None), "DblPend": (DblPend, None),
}
STRATEGIES = ["nn", "col+rnd", "col_only", "row_col", "row", "col_full"]
OUT = "results/strategy_k.json"


def main():
    names = sys.argv[1:] or list(SYSTEMS)
    rows = json.load(open(OUT)) if os.path.exists(OUT) else []
    done = {(r["system"], r["strategy"]) for r in rows if "K" in r}
    ref = json.load(open("results/ref_strategy_k.json"))

    for name in names:
        ctor, Narg = SYSTEMS[name]
        ode = ctor(normalization="-11")
        cfg = Config(ode, N=Narg).get()
        solver = RKSolver(ode.get_vector_field(), cfg["Ng"], cfg["Nf"],
                          G=cfg["G"], F=cfg["F"])
        for strat in STRATEGIES:
            if (name, strat) in done:
                print("skip (done):", name, strat, flush=True)
                continue
            p = Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=5e-7,
                         verbose=None)
            t0 = time.time()
            try:
                out = p.run(model="nngp", nn=16, strategy=strat,
                            optimizer="grid")
                row = {"system": name, "strategy": strat, "K": out["k"],
                       "converged": bool(out["converged"]),
                       "ref_K": ref[name][strat],
                       "wall_s": round(time.time() - t0, 1)}
            except Exception as e:
                row = {"system": name, "strategy": strat,
                       "error": str(e)[:200], "ref_K": ref[name][strat],
                       "wall_s": round(time.time() - t0, 1)}
            print(row, flush=True)
            rows.append(row)
            os.makedirs("results", exist_ok=True)
            with open(OUT, "w") as fh:
                json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
