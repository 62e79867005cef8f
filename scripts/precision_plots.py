"""Per-system convergence/precision figures for the 6 Table-2 ODE systems
(reference Precision_plots_all_systems.py:24-47 — its Figures 7-12 rename
the stored `all_models` runs and call solver.plot(), producing the
img/*_prec and img/*_conv artifacts).

Here: run {Parareal, GParareal(grid), nnGParareal(grid)} per system at
eps=5e-7 on the CPU backend (reference-arithmetic f64), then store the
same two panels per system via reporting.plot_run:
  img/{sys}_conv  — max-abs error per iteration for the three models
  img/{sys}_prec  — converged-intervals panels (cumulative / per-iter /
                    first-interval error)
Run rows (K per model) land in results/precision_plots_runs.json.

Usage: python scripts/precision_plots.py [system ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from nngparareal_tpu import (  # noqa: E402
    FHNODE, Rossler, Hopf, Brusselator, Lorenz, DblPend, Config, RKSolver,
    Parareal,
)
from nngparareal_tpu.reporting import plot_run  # noqa: E402
from nngparareal_tpu.utils.io import store_fig  # noqa: E402

# (ctor, nn at 5e-7, Config N override) — reference Table_2.py:42-44;
# Hopf's config is N-dependent (reference configs.py:35-46), N=32 in Table 2
SYSTEMS = {
    "FHN_ODE": (FHNODE, 15, None),
    "Rossler": (Rossler, 15, None),
    "Hopf": (Hopf, 15, 32),
    "Brusselator": (Brusselator, 14, None),
    "Lorenz": (Lorenz, 14, None),
    "DblPend": (DblPend, 15, None),
}
OUT = "results/precision_plots_runs.json"


def main():
    names = sys.argv[1:] or list(SYSTEMS)
    # resume: keep rows from systems not being (re)run
    rows = []
    if os.path.exists(OUT):
        with open(OUT) as fh:
            rows = [r for r in json.load(fh) if r["system"] not in names]
    for name in names:
        ctor, nn, Narg = SYSTEMS[name]
        ode = ctor(normalization="-11")
        cfg = Config(ode, N=Narg).get() if Narg else Config(ode).get()
        solver = RKSolver(ode.get_vector_field(), cfg["Ng"], cfg["Nf"],
                          G=cfg["G"], F=cfg["F"])
        p = Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=5e-7,
                     verbose=None)
        # display names mirror the reference's renames
        # (Precision_plots_all_systems.py:24-31)
        for model, kw, label in [
            ("parareal", {}, "Parareal"),
            ("gpjax", dict(optimizer="grid"), "GParareal"),
            ("nngp", dict(optimizer="grid", nn=nn),
             f"nnGParareal m={nn}"),
        ]:
            t0 = time.time()
            out = p.run(model=model, cstm_mdl_name=label, **kw)
            rows.append({
                "system": name, "model": label, "K": out["k"],
                "converged": bool(out["converged"]),
                "wall_s": round(time.time() - t0, 1),
            })
            print(rows[-1], flush=True)
        figs = plot_run(p, add_title="")
        store_fig(figs[0], f"{name.lower()}_conv")
        store_fig(figs[1], f"{name.lower()}_prec")
        with open(OUT, "w") as fh:
            json.dump(rows, fh, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
