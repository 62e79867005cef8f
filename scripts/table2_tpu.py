"""Table-2 sweep on the TPU chip: 6 ODE systems, selectable eps / models /
fine-solver arithmetic.

Serves three round-3 goals in one driver (VERDICT r2 items 1-3):
  * ds32 K-parity across the zoo   -> fine=ds
  * the eps=5e-9 Table-2 block     -> eps 5e-9 (reference Table_2.py:24-47)
  * batched-TPU GParareal parity   -> model gpjax (models/gp.py, not the
    scipy oracle)

Usage:
  python scripts/table2_tpu.py <eps> <fine: f64|ds> <model> [model...]
  models: parareal nngp-grid nngp-nm gpjax gp-oracle nngp-oracle
  env TABLE2_CPU=1    force the CPU backend (reference-arithmetic parity
                      runs: K at eps=5e-9 is sensitive to the fine
                      solver's last-ulp rounding, and the TPU's emulated
                      f64 differs from IEEE CPU f64 there)
  env TABLE2_ONLY=a,b restrict to the named systems

Appends rows to results/table2_tpu.json (keyed by
system/eps/fine/model/backend) so successive invocations build one
artifact.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORCE_CPU = os.environ.get("TABLE2_CPU") == "1"
if FORCE_CPU:
    import jax

    jax.config.update("jax_platforms", "cpu")

try:
    from nngparareal_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache(verbose=True)
except Exception as _e:
    print(f"[compile-cache] enable failed: {_e!r}", flush=True)

from nngparareal_tpu import (
    FHNODE, Rossler, Hopf, DblPend, Brusselator, Lorenz, Config, RKSolver,
    Parareal,
)

# name, ctor, N-arg, (nn@5e-7, nn@5e-9), published K (P, GP, nnGP)@5e-7,
# published K @5e-9  (BASELINE.md section 1)
SYSTEMS = [
    ("FHN_ODE", FHNODE, None, (15, 13), (11, 5, 5), (14, 6, 6)),
    ("Rossler", Rossler, None, (15, 13), (18, 13, 12), (20, 14, 14)),
    ("Hopf", Hopf, 32, (15, 12), (19, 10, 9), (22, 11, 10)),
    ("Brusselator", Brusselator, None, (14, 12), (19, 20, 17), (19, 20, 18)),
    ("Lorenz", Lorenz, None, (14, 13), (15, 11, 9), (17, 12, 10)),
    ("DblPend", DblPend, None, (15, 14), (15, 10, 10), (16, 12, 11)),
]

# env TABLE2_OUT: alternate artifact path, so concurrent sweeps (e.g. a CPU
# parity loop beside the on-chip loop) don't read-modify-write race on the
# same JSON; merge afterwards with scripts/dev/merge_table2.py-style jq
OUT = os.environ.get("TABLE2_OUT", "results/table2_tpu.json")


def load_rows():
    if os.path.exists(OUT):
        with open(OUT) as fh:
            return json.load(fh)
    return []


def main():
    eps = float(sys.argv[1])
    fine = sys.argv[2]
    models = sys.argv[3:] or ["nngp-grid"]
    assert fine in ("f64", "ds")
    tight = eps < 1e-7

    import jax as _jax

    backend = "cpu" if FORCE_CPU else _jax.default_backend()
    only = os.environ.get("TABLE2_ONLY")
    only = set(only.split(",")) if only else None

    rows = load_rows()
    done = {(r["system"], r["eps"], r["fine"], r["model"],
             r.get("backend", "axon"), r.get("sweep", "scan"))
            for r in rows if "K" in r}

    for name, ctor, Narg, nns, pub7, pub9 in SYSTEMS:
        if only and name not in only:
            continue
        nn = nns[1] if tight else nns[0]
        pub = pub9 if tight else pub7
        ode = ctor(normalization="-11")
        cfg = Config(ode, N=Narg).get()
        fine_ds = ode.get_ds_vector_field() if fine == "ds" else None
        solver = RKSolver(
            ode.get_vector_field(), cfg["Ng"], cfg["Nf"], G=cfg["G"],
            F=cfg["F"], fine_ds=fine_ds, fine=fine if fine_ds else None,
        )
        for mdl in models:
            if mdl == "nngp-nm" and os.environ.get("TABLE2_SEED", "45") != "45":
                mdl = f"nngp-nm-s{os.environ['TABLE2_SEED']}"
            # expected sweep mode, for the dedup key only; the ROW
            # records the driver's actual resolved mode from timings
            sweep = ("host_cpu" if (eps < 1e-8 and backend != "cpu"
                                    and mdl not in ("parareal", "gp-oracle",
                                                    "nngp-oracle"))
                     else "scan")
            key = (name, eps, fine, mdl, backend, sweep)
            if key in done:
                print("skip (done):", key, flush=True)
                continue
            p = Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=eps,
                         verbose=None)
            t0 = time.time()
            try:
                if mdl == "parareal":
                    out = p.run(model="parareal")
                elif mdl == "nngp-grid":
                    out = p.run(model="nngp", nn=nn, optimizer="grid")
                elif mdl.startswith("nngp-nm"):
                    seed = int(os.environ.get("TABLE2_SEED", "45"))
                    out = p.run(model="nngp", nn=nn, optimizer="nm",
                                seed=seed)
                elif mdl == "nngp-grid-polish":
                    out = p.run(model="nngp", nn=nn, optimizer="grid",
                                grid_polish=True)
                elif mdl == "gpjax":
                    out = p.run(model="gpjax", fatol=1e-6, xatol=1e-6)
                elif mdl == "gpjax-f32":
                    import jax.numpy as _jnp

                    out = p.run(model="gpjax", fatol=1e-6, xatol=1e-6,
                                score_dtype=_jnp.float32)
                elif mdl == "gpjax-grid":
                    # NM-free dense-grid hyperopt (the TPU path: the axon
                    # toolchain kernel-faults the 2nd batched-NM
                    # executable per process; see models/gp.py)
                    out = p.run(model="gpjax", optimizer="grid")
                elif mdl == "gp-oracle":
                    out = p.run(model="gpjax_scipy", fatol=1e-6, xatol=1e-6)
                elif mdl == "nngp-oracle":
                    out = p.run(model="nngp_scipy", nn=nn)
                else:
                    raise ValueError(mdl)
                row = {
                    "system": name, "N": cfg["N"], "eps": eps, "fine": fine,
                    "model": mdl, "nn": nn, "backend": backend,
                    # the driver's RESOLVED sweep mode ('host_cpu' = the
                    # 5e-9 precision router ran model math on IEEE CPU)
                    "sweep": out["timings"].get("sweep_mode", sweep),
                    "K": out["k"],
                    "converged": bool(out["converged"]),
                    "published": {"parareal": pub[0], "gpjax": pub[1],
                                  "nngp": pub[2]},
                    "runtime_s": round(out["timings"]["runtime"], 1),
                    "wall_s": round(time.time() - t0, 1),
                }
            except Exception as e:
                row = {"system": name, "N": cfg["N"], "eps": eps,
                       "fine": fine, "model": mdl, "nn": nn,
                       "backend": backend, "error": str(e)[:200],
                       "wall_s": round(time.time() - t0, 1)}
            print(row, flush=True)
            rows.append(row)
            os.makedirs("results", exist_ok=True)
            with open(OUT, "w") as fh:
                json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
