"""Config-driven replacements for the reference's experiment drivers (L6).

Each function reproduces one of the paper's experiment setups with the
exact hyperparameters of the corresponding reference script:

* ``run_hopf``    — Hopf.py:60-92 (N in {32..512}, Nf x10000, GP
                    fatol=1e-6, nnGP nn=15 n_restarts=2)
* ``run_tomlab``  — TomLab.py:72-116 (T per N, GP fatol=1e-1,
                    nnGP nn=18 fatol=1e-3)
* ``run_burgers`` — Burgers.py:27-122 (d=N=128, T in {5, 5.9}, nnGP nn=18)
* ``run_fhn_pde`` — FHN_PDE.py:34-175 (dx in {10..16}, N=512, nnGP nn=20)
* ``run_table2``  — Table_2.py:24-47 (6 ODE systems, eps in {5e-7, 5e-9})
* ``run_burgers_across_m`` — Burgers_perf_across_m.py (K vs m sweep)

Where the reference fans runs over an MPI pool, these execute each model
sequentially on the visible TPU mesh (each run is itself one SPMD
program). Results are pickled under ``results/``.
"""

import os

import numpy as np

from nngparareal_tpu.systems import (
    FHNODE, Rossler, Hopf, DblPend, Brusselator, Lorenz, ThomasLabyrinth,
    FHNPDE, Burgers,
)
from nngparareal_tpu.systems.configs import Config
from nngparareal_tpu.solver import RKSolver
from nngparareal_tpu.driver import Parareal
from nngparareal_tpu.reporting import est_serial, calc_speedup
from nngparareal_tpu.utils.io import store_pickle


MODELS_DEFAULT = ("parareal", "gpjax", "nngp")


def _summarize(name, out, N):
    return {
        "name": name,
        "k": out["k"],
        "converged": out["converged"],
        "runtime": out["timings"]["runtime"],
        "F_time": out["timings"]["F_time"],
        "G_time": out["timings"]["G_time"],
        "mdl_tot_t": out["timings"]["mdl_tot_t"],
        "est_serial": est_serial(out, N),
        "speedup": calc_speedup(out, N=N),
        "conv_int": out["conv_int"],
        "err": out["err"],
        "timings": out["timings"],
    }


def _run_models(p, model_kwargs, models, results_dir, tag, nngp_kw=None,
                **common):
    rows = []
    for mdl in models:
        kw = dict(common)
        kw.update(model_kwargs.get(mdl, {}))
        if nngp_kw and mdl == "nngp":
            # caller overrides (e.g. optimizer='grid', the TPU-native
            # deterministic hyperopt — the NM default is reference parity)
            kw.update(nngp_kw)
        out = p.run(model=mdl, **kw)
        rows.append(_summarize(mdl, out, p.N))
        if results_dir:
            store_pickle(rows, f"{tag}.pkl", results_dir)
    return rows


def run_hopf(N, models=MODELS_DEFAULT, results_dir="results", mesh=None,
             store_int=False, fine_mult=10000, nngp_kw=None, gp_kw=None):
    """Hopf scalability (reference Hopf.py:60-92): Nf scaled x10000 and
    fine solves paged in Nf/N/25 chunks (Hopf.py:65-69)."""
    ode = Hopf(normalization="-11")
    cfg = Config(ode, N=N).get()
    Nf = cfg["Nf"] * fine_mult
    solver = RKSolver(
        ode.get_vector_field(), cfg["Ng"], Nf,
        G=cfg["G"], F=cfg["F"], thresh=max(Nf // 25, 1),
    )
    p = Parareal(ode, solver, cfg["tspan"], N, epsilon=5e-7)
    model_kwargs = {
        "gpjax": dict(theta=[1, 1], fatol=1e-6, xatol=1e-6,
                      **(gp_kw or {})),
        "nngp": dict(fatol=1e-1, xatol=1e-1, nn=15, n_restarts=2, seed=45),
    }
    return _run_models(
        p, model_kwargs, models, results_dir, f"hopf_{N}",
        mesh=mesh, store_int=store_int, nngp_kw=nngp_kw,
    )


def run_tomlab(N, models=MODELS_DEFAULT, results_dir="results", mesh=None,
               store_int=False, nngp_kw=None, gp_kw=None):
    """Thomas labyrinth scalability (reference TomLab.py:72-116)."""
    ode = ThomasLabyrinth(normalization="-11")
    cfg = Config(ode, N=N).get()
    solver = RKSolver(
        ode.get_vector_field(), cfg["Ng"], cfg["Nf"], G=cfg["G"], F=cfg["F"]
    )
    p = Parareal(ode, solver, cfg["tspan"], N, epsilon=5e-7)
    model_kwargs = {
        "gpjax": dict(fatol=1e-1, xatol=1e-1, **(gp_kw or {})),
        "nngp": dict(nn=18, n_restarts=1, fatol=1e-3, xatol=1e-3, seed=45),
    }
    return _run_models(
        p, model_kwargs, models, results_dir, f"tomlab_{N}",
        mesh=mesh, store_int=store_int, nngp_kw=nngp_kw,
    )


def run_burgers(T=5.9, N=128, models=MODELS_DEFAULT, results_dir="results",
                mesh=None, store_int=False, nn=18, seed=45, nngp_kw=None):
    """Viscous Burgers d=N=128 (reference Burgers.py:27-122)."""
    ode = Burgers(d_x=N, normalization="-11")
    Ng = 4  # per-slice; totals Ng=4N
    Nf = Ng * 10000
    solver = RKSolver(ode.get_vector_field(), Ng, Nf, G="RK1", F="RK8")
    p = Parareal(ode, solver, [0.0, T], N, epsilon=5e-7)
    model_kwargs = {"nngp": dict(nn=nn, seed=seed)}
    return _run_models(
        p, model_kwargs, models, results_dir, f"burgers_{N}_T{T}",
        mesh=mesh, store_int=store_int, nngp_kw=nngp_kw,
    )


def run_fhn_pde(dx, models=MODELS_DEFAULT, results_dir="results", mesh=None,
                store_int=False, nngp_kw=None):
    """FHN 2D PDE, N=512, d=2*dx^2 (reference FHN_PDE.py:34-175).

    Note: the scaling driver uses Nf = ceil(1e8/Ng)*Ng (FHN_PDE.py:54),
    not the v3 Config's ~1e4, and pages fine solves in Nf/N/25 chunks."""
    ode = FHNPDE(d_x=dx, normalization="-11")
    cfg = Config(ode, d_x=dx).get()
    N = cfg["N"]
    Ng_tot = cfg["Ng"] * N
    Nf = int(np.ceil(1e8 / Ng_tot) * Ng_tot) // N
    solver = RKSolver(
        ode.get_vector_field(), cfg["Ng"], Nf, G=cfg["G"], F=cfg["F"],
        thresh=max(Nf // 25, 1),
    )
    p = Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=5e-7)
    model_kwargs = {"nngp": dict(nn=20)}
    return _run_models(
        p, model_kwargs, models, results_dir, f"fhn_pde_{dx}",
        mesh=mesh, store_int=store_int, nngp_kw=nngp_kw,
    )


_TABLE2_SYSTEMS = [
    # (ctor, nn at 5e-7, nn at 5e-9) — Table_2.py:42-44
    (FHNODE, 15, 13),
    (Rossler, 15, 13),
    (lambda **kw: Hopf(**kw), 15, 12),
    (Brusselator, 14, 12),
    (Lorenz, 14, 13),
    (DblPend, 15, 14),
]


def _run_table2_system(task, mesh=None):
    """One whole-system Table-2 run; module-level so it pickles into a
    spawned worker (the reference keeps pool-shipped functions at module
    scope for the same reason, RK.py:141-144). Workers force the CPU
    backend: a single TPU chip cannot be shared between processes, and the
    reference's experiment-level pool was likewise CPU workers
    (Table_2.py:46)."""
    idx, epsilon, models, in_worker, gp_kw = (
        task if len(task) == 5 else (*task, None)
    )
    if in_worker:
        import jax

        jax.config.update("jax_platforms", "cpu")
    ctor, nn7, nn9 = _TABLE2_SYSTEMS[idx]
    nn = nn7 if epsilon == 5e-7 else nn9
    ode = ctor(normalization="-11")
    N_arg = 32 if isinstance(ode, Hopf) else None
    cfg = Config(ode, N=N_arg).get()
    solver = RKSolver(
        ode.get_vector_field(), cfg["Ng"], cfg["Nf"], G=cfg["G"], F=cfg["F"]
    )
    p = Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=epsilon)
    model_kwargs = {
        "nngp": dict(nn=nn),
        "gpjax": dict(fatol=1e-6, xatol=1e-6, **(gp_kw or {})),
    }
    sys_rows = _run_models(p, model_kwargs, models, None, "", mesh=mesh)
    return {"system": ode.name, "epsilon": epsilon, "nn": nn,
            "runs": sys_rows}


def run_table2(epsilon=5e-7, models=MODELS_DEFAULT, results_dir="results",
               mesh=None, systems=None, pool=None, gp_kw=None):
    """Iterations-to-convergence across 6 ODE systems (Table_2.py:24-47).

    ``systems``: optional subset of system names (e.g. ["FHN_ODE"]).
    ``pool``: experiment-level parallelism — an int fans the whole-system
    runs over that many spawned CPU worker processes, the reference's
    ``pool.map(do, range(len(names)))`` (Table_2.py:46). Mutually
    exclusive with ``mesh`` (one SPMD program per process).
    """
    sel = [i for i, (ctor, _, _) in enumerate(_TABLE2_SYSTEMS)
           if systems is None
           or ctor(normalization="-11").name in systems]
    if pool:
        if mesh is not None:
            raise ValueError("pool= (process fan-out) and mesh= (SPMD) "
                             "are mutually exclusive")
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        tasks = [(i, epsilon, tuple(models), True, gp_kw) for i in sel]
        with ProcessPoolExecutor(
            max_workers=pool, mp_context=mp.get_context("spawn")
        ) as ex:
            rows = list(ex.map(_run_table2_system, tasks))
        if results_dir:
            store_pickle(rows, f"table2_eps{epsilon:g}.pkl", results_dir)
        return rows
    rows = []
    for i in sel:
        row = _run_table2_system((i, epsilon, tuple(models), False, gp_kw),
                                 mesh=mesh)
        rows.append(row)
        if results_dir:
            store_pickle(rows, f"table2_eps{epsilon:g}.pkl", results_dir)
    return rows


def run_burgers_across_m(ms=range(11, 31), seeds=range(100), T=5.9,
                         results_dir="results", mesh=None):
    """K and speedup distribution vs neighbour count m
    (Burgers_perf_across_m.py:100-135). Each seed is threaded through to
    the nnGP's restart RNG, as `s.run(..., nn=nn, seed=seed)` does in the
    reference (Burgers_perf_across_m.py:117)."""
    rows = []
    for m in ms:
        for seed in seeds:
            try:
                res = run_burgers(
                    T=T, models=("nngp",), results_dir=None, mesh=mesh,
                    nn=m, seed=int(seed),
                )[0]
                rows.append({"m": m, "seed": seed, "k": res["k"],
                             "speedup": res["speedup"]})
            except Exception as e:  # record failures as data rows
                rows.append({"m": m, "seed": seed, "error": str(e)})
            if results_dir:
                store_pickle(rows, f"burgers_across_m_T{T}.pkl", results_dir)
    return rows


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="nngparareal_tpu experiments")
    ap.add_argument("experiment", choices=[
        "hopf", "tomlab", "burgers", "fhn_pde", "table2", "burgers_m",
    ])
    ap.add_argument("--N", type=int, default=None)
    ap.add_argument("--dx", type=int, default=None)
    ap.add_argument("--T", type=float, default=5.9)
    ap.add_argument("--epsilon", type=float, default=5e-7)
    ap.add_argument("--models", nargs="+", default=list(MODELS_DEFAULT))
    ap.add_argument("--results-dir", default="results")
    ap.add_argument("--mesh-devices", type=int, default=None)
    ap.add_argument("--nngp-grid", action="store_true",
                    help="nnGP grid hyperopt (TPU-native path; default is "
                         "the reference-parity Nelder-Mead)")
    ap.add_argument("--gp-f32", action="store_true",
                    help="full-GP NLL scoring in f32 (native MXU Cholesky "
                         "of the growing Gram; posterior fit stays f64)")
    ap.add_argument("--gp-nm-iters", type=int, default=None,
                    help="full-GP fixed Nelder-Mead iteration count "
                         "(default 400)")
    ap.add_argument("--pool", type=int, default=None,
                    help="table2: fan whole-system runs over this many "
                         "spawned CPU worker processes (the reference's "
                         "experiment-level pool.map, Table_2.py:46)")
    ap.add_argument("--systems", nargs="+", default=None,
                    help="table2: subset of system names")
    args = ap.parse_args(argv)

    mesh = None
    if args.mesh_devices:
        from nngparareal_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_devices)

    nngp_kw = dict(optimizer="grid") if args.nngp_grid else None
    gp_kw = None
    if args.gp_f32:
        import jax.numpy as jnp

        # f32 NLL *scoring* (candidate ranking only; the posterior alpha
        # fit stays f64): the growing full-GP Gram Cholesky runs native
        # on the MXU instead of software-emulated f64 — the TPU answer
        # to the cubic model-cost blow-up of BASELINE section 2
        gp_kw = dict(score_dtype=jnp.float32)
    if args.gp_nm_iters:
        gp_kw = dict(gp_kw or {}, nm_max_iters=args.gp_nm_iters)
    if args.experiment == "hopf":
        rows = run_hopf(args.N or 32, tuple(args.models), args.results_dir,
                        mesh, nngp_kw=nngp_kw, gp_kw=gp_kw)
    elif args.experiment == "tomlab":
        rows = run_tomlab(args.N or 32, tuple(args.models), args.results_dir,
                          mesh, nngp_kw=nngp_kw, gp_kw=gp_kw)
    elif args.experiment == "burgers":
        rows = run_burgers(args.T, args.N or 128, tuple(args.models),
                           args.results_dir, mesh, nngp_kw=nngp_kw)
    elif args.experiment == "fhn_pde":
        rows = run_fhn_pde(args.dx or 10, tuple(args.models),
                           args.results_dir, mesh, nngp_kw=nngp_kw)
    elif args.experiment == "table2":
        rows = run_table2(args.epsilon, tuple(args.models), args.results_dir,
                          mesh, systems=args.systems, pool=args.pool,
                          gp_kw=gp_kw)
    else:
        rows = run_burgers_across_m(T=args.T, results_dir=args.results_dir,
                                    mesh=mesh)

    for r in rows if isinstance(rows, list) else [rows]:
        if "runs" in r:
            for rr in r["runs"]:
                print(r["system"], rr["name"], "K =", rr["k"],
                      f"speedup = {rr['speedup']:.2f}")
        elif "k" in r:
            print(r["name"], "K =", r["k"], f"speedup = {r.get('speedup', float('nan')):.2f}")
    return rows


if __name__ == "__main__":
    main()
