"""Table-2 parity sweep on CPU: K to convergence for the 6 ODE systems.

Writes PARITY.md + results/parity.json. Published values from BASELINE.md
section 1 (eps=5e-7 block).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from nngparareal_tpu import (
    FHNODE, Rossler, Hopf, DblPend, Brusselator, Lorenz, Config, RKSolver,
    Parareal,
)

# (ctor, N-arg, nn at 5e-7, published K: parareal/gp/nngp)
SYSTEMS = [
    ("FHN_ODE", FHNODE, None, 15, (11, 5, 5)),
    ("Rossler", Rossler, None, 15, (18, 13, 12)),
    ("Hopf", Hopf, 32, 15, (19, 10, 9)),
    ("Brusselator", Brusselator, None, 14, (19, 20, 17)),
    ("Lorenz", Lorenz, None, 14, (15, 11, 9)),
    ("DblPend", DblPend, None, 15, (15, 10, 10)),
]


def main():
    models = sys.argv[1:] or ["parareal", "nngp-grid", "nngp-nm"]
    rows = []
    for name, ctor, Narg, nn, published in SYSTEMS:
        ode = ctor(normalization="-11")
        cfg = Config(ode, N=Narg).get()
        solver = RKSolver(
            ode.get_vector_field(), cfg["Ng"], cfg["Nf"], G=cfg["G"], F=cfg["F"]
        )
        row = {"system": name, "N": cfg["N"], "nn": nn,
               "published": {"parareal": published[0], "gpjax": published[1],
                              "nngp": published[2]}}
        for mdl in models:
            p = Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=5e-7,
                         verbose=None)
            t0 = time.time()
            try:
                if mdl == "parareal":
                    out = p.run(model="parareal")
                elif mdl == "nngp-grid":
                    out = p.run(model="nngp", nn=nn, optimizer="grid")
                elif mdl == "nngp-nm":
                    out = p.run(model="nngp", nn=nn, optimizer="nm")
                elif mdl == "gpjax":
                    out = p.run(model="gpjax", fatol=1e-6, xatol=1e-6)
                row[mdl] = {"K": out["k"], "converged": bool(out["converged"]),
                            "secs": round(time.time() - t0, 1)}
            except Exception as e:
                row[mdl] = {"error": str(e)[:100]}
            print(name, mdl, row[mdl], flush=True)
        rows.append(row)
        os.makedirs("results", exist_ok=True)
        with open("results/parity.json", "w") as fh:
            json.dump(rows, fh, indent=1)

    lines = [
        "# PARITY — iterations-to-convergence vs published Table 2",
        "",
        "eps=5e-7, [-1,1]-normalized systems, paper configs "
        "(BASELINE.md section 1). 'pub' columns are the reference's",
        "published K; K is seed/optimizer-path sensitive (the paper's own "
        "Figure 3 studies its spread across seeds).",
        "",
        "| System | N | pub P/GP/nnGP | Parareal | nnGP(grid) | nnGP(NM) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        pub = r["published"]
        def fmt(key):
            v = r.get(key, {})
            if "K" in v:
                return str(v["K"]) + ("" if v["converged"] else "!")
            return "err" if v else "-"
        lines.append(
            f"| {r['system']} | {r['N']} | {pub['parareal']}/{pub['gpjax']}/"
            f"{pub['nngp']} | {fmt('parareal')} | {fmt('nngp-grid')} | "
            f"{fmt('nngp-nm')} |"
        )
    with open("PARITY.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
