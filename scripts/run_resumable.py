"""Crash-resumable single-system run: per-iteration checkpoints + resume.

The axon TPU toolchain sporadically kernel-faults long multi-executable
processes (see models/gp.py notes). The framework's per-iteration
checkpoint/resume subsystem (driver.py _store_int/load_int_dump — the
reference used the same mechanism against 48h SLURM limits,
parareal.py:420-431, TomLab.py:208-221) makes those runs completable: each
invocation resumes from the newest checkpoint in a FRESH process (fresh
executable budget), so an outer shell loop converges even if individual
processes die.

Usage:
  python scripts/run_resumable.py <system> <model> <eps> [key=val ...]
    system: FHN_ODE Rossler Hopf Brusselator Lorenz DblPend (or Hopf:256
            for an explicit N)
    model:  gpjax-grid | nngp-grid | nngp-nm | nngp-time | parareal
    keys:   nn=15 early_stop=8 fine=ds nf_mul=10000 score=f32 n_restarts=2
Exit 0 once converged (or early-stopped); the success row is appended to
results/resumable_runs.json. Re-invoke until exit 0, e.g.:
  for i in 1 2 3 4 5 6; do python scripts/run_resumable.py Rossler \
      gpjax-grid 5e-7 && break; sleep 120; done
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("RESUMABLE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

# persistent compile cache: every resume attempt is a fresh process, so
# without this each attempt re-pays the full grid/fan-out compile wall
# (round-4 weak #2 — 612.9 s cold compiles; utils/compile_cache docstring)
try:
    from nngparareal_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache(verbose=True)
except Exception as _e:  # diagnostics only — cold compile is the fallback
    print(f"[compile-cache] enable failed: {_e!r}", flush=True)

from nngparareal_tpu import (
    FHNODE, Rossler, Hopf, DblPend, Brusselator, Lorenz, Config, RKSolver,
    Parareal,
)
from nngparareal_tpu.systems import ThomasLabyrinth

CTORS = {
    "FHN_ODE": (FHNODE, None), "Rossler": (Rossler, None),
    "Hopf": (Hopf, 32), "Brusselator": (Brusselator, None),
    "Lorenz": (Lorenz, None), "DblPend": (DblPend, None),
    # TomLab GP scaling rows (BASELINE section 3; reference TomLab.py:106-116
    # ran GParareal here too, DNF at N=512): N via TomLab:64 etc.
    "TomLab": (ThomasLabyrinth, 32),
}
OUT = "results/resumable_runs.json"


def main():
    sysname = sys.argv[1]
    mdl_tag = sys.argv[2]
    eps = float(sys.argv[3])
    opts = dict(kv.split("=", 1) for kv in sys.argv[4:])

    if ":" in sysname:
        sysname, n_str = sysname.split(":")
        Narg = int(n_str)
    else:
        Narg = CTORS[sysname][1]
    ctor = CTORS[sysname][0]

    ode = ctor(normalization="-11")
    cfg = Config(ode, N=Narg).get()
    Nf = cfg["Nf"] * int(opts.get("nf_mul", 1))
    fine_kw = {}
    if opts.get("fine") in ("ds", "pallas", "auto"):
        fine_kw = dict(fine_ds=ode.get_ds_vector_field(),
                       fine=opts.get("fine"))
    if "min_rows" in opts:  # small-N sublane-fill mitigation (ops/rk.py)
        fine_kw["fine_min_rows"] = int(opts["min_rows"])
    thresh = max(Nf // 25, 1) if "nf_mul" in opts else None
    solver = RKSolver(ode.get_vector_field(), cfg["Ng"], Nf, G=cfg["G"],
                      F=cfg["F"], **(dict(thresh=thresh) if thresh else {}),
                      **fine_kw)
    N = cfg["N"]
    # verbose=v prints the driver's per-iteration progress lines — the
    # long CPU chains (nngp-time Lorenz) are unobservable without them
    p = Parareal(ode, solver, cfg["tspan"], N, epsilon=eps,
                 verbose=opts.get("verbose"))

    run_kw = {}
    if mdl_tag == "gpjax-grid":
        model = "gpjax"
        run_kw = dict(optimizer="grid")
    elif mdl_tag == "nngp-grid":
        model = "nngp"
        run_kw = dict(optimizer="grid", nn=int(opts.get("nn", 15)))
    elif mdl_tag == "nngp-nm":
        model = "nngp"
        run_kw = dict(optimizer="nm", nn=int(opts.get("nn", 15)), seed=45)
    elif mdl_tag == "nngp-time":
        model = "nngp_time"
        run_kw = dict(
            nn=int(opts.get("nn", 11)), seed=45, fatol=1e-1, xatol=1e-1,
            reps=int(opts.get("reps", 10)),
            nn_iters=int(opts.get("nn_iters", 10)),
            n_restarts=int(opts.get("n_restarts", 10)),
            nm_max_iters=int(opts.get("nm_max_iters", 150)),
        )
    elif mdl_tag == "parareal":
        model = "parareal"
    else:
        raise ValueError(mdl_tag)
    if opts.get("score") == "f32":
        import jax.numpy as jnp

        run_kw["score_dtype"] = jnp.float32
    if "early_stop" in opts:
        run_kw["early_stop"] = int(opts["early_stop"])
    if "cap_iters" in opts:
        run_kw["cap_iters"] = int(opts["cap_iters"])
    if "sweep" in opts:
        # e.g. sweep=host — per-interval dispatches instead of one fused
        # scan executable (the suspected nngp-time on-chip kernel-fault
        # is the refinement chain's giant scan program, NOTES_ROUND3)
        run_kw["sweep_mode"] = opts["sweep"]

    # checkpoint namespace includes every run-shaping option, so runs with
    # different solver/model configs (nf_mul, fine, nn, ...) can never
    # silently resume each other's trajectories; tag= separates backends
    base_dir = f"results/ckpt/{sysname}_{N}_{mdl_tag}_{eps:g}"
    # tag and verbose don't shape the trajectory — keep them out of the
    # checkpoint namespace so toggling them resumes the same run
    shaped = {k: v for k, v in opts.items() if k not in ("tag", "verbose")}
    int_dir = base_dir
    if shaped:
        int_dir += "__" + "_".join(
            f"{k}-{v}" for k, v in sorted(shaped.items())
        )
    if "tag" in opts:  # separate checkpoint namespace (e.g. cpu vs tpu)
        int_dir += f"_{opts['tag']}"
    os.makedirs(int_dir, exist_ok=True)
    ckpts = glob.glob(os.path.join(int_dir, "*", "*_int_*"))
    if not ckpts and shaped:
        # pre-namespace-change checkpoints live under the unsuffixed dir;
        # adopt them once (new checkpoints land in the suffixed dir)
        legacy = base_dir + (f"_{opts['tag']}" if "tag" in opts else "")
        lck = glob.glob(os.path.join(legacy, "*", "*_int_*"))
        if lck:
            print(f"note: resuming from legacy checkpoint dir {legacy}",
                  flush=True)
            ckpts = lck
    t0 = time.time()
    if ckpts:
        latest = max(ckpts, key=lambda s: int(s.rsplit("_", 1)[-1]))
        print(f"resuming from {latest}", flush=True)
        try:
            out = p.load_int_dump(latest, model=model, store_int=True,
                                  int_dir=int_dir, **run_kw)
        except Exception as e:
            if "already converged" in str(e):
                # the run finished in a previous attempt (its result row
                # was appended then); nothing left to do — exit 0 so the
                # outer retry loop moves on instead of burning attempts
                print(f"checkpoint {latest} is already converged; done",
                      flush=True)
                return
            raise
        attempts = len(ckpts)  # rough proxy: one line per stored iteration
    else:
        out = p.run(model=model, store_int=True, int_dir=int_dir, **run_kw)
        attempts = 0

    row = {
        "system": sysname, "N": N, "eps": eps, "model": mdl_tag,
        "backend": "cpu" if os.environ.get("RESUMABLE_CPU") == "1" else "tpu",
        "K": out["k"], "converged": bool(out["converged"]),
        "resumed_from_iter": attempts,
        "opts": opts,
        "timings": {a: round(float(v), 2)
                    for a, v in out["timings"].items()
                    if isinstance(v, (int, float))},
        "wall_s_final_proc": round(time.time() - t0, 1),
    }
    print(row, flush=True)
    rows = json.load(open(OUT)) if os.path.exists(OUT) else []
    rows.append(row)
    with open(OUT, "w") as fh:
        json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
