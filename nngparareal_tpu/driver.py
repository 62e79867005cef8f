"""The parareal orchestrator (predictor-corrector sweep over time slices).

Functional equivalent of the reference ``Parareal``/``PararealLight``
classes (reference parareal.py:26-1071), rebuilt around three fused XLA
programs per iteration instead of host loops + process pools:

1. **fine fan-out** — one vmapped (optionally mesh-sharded) RK kernel over
   all N slices (replaces the MPI pool.map, parareal.py:310-315). All N
   slices are integrated every iteration: frozen slices recompute their
   (bitwise identical) values in otherwise-idle vector lanes, which keeps
   every shape static.
2. **model fit** — batched GP hyperparameter training (models decide).
3. **sweep** — the inherently sequential corrector loop
   ``u_{i+1} = model(u_i) + G(u_i)`` (parareal.py:359-382) as ONE
   ``lax.scan`` whose body fuses the coarse RK solve and the model
   prediction; already-converged slices short-circuit through
   ``lax.cond`` so they cost nothing.

State is rolling (O(N n)), like the reference's PararealLight
(parareal.py:812-1060); per-iteration history is optionally captured on
the host for plotting/debug parity with the full Parareal class. The
convergence bookkeeping (prefix freeze, err columns, early stop, NaN
guards) matches parareal.py:301-439 exactly — the published
iterations-to-convergence K are the acceptance oracle.
"""

import os
import pickle
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from nngparareal_tpu.models import (
    BareParareal,
    NNGParareal,
    GParareal,
    ELM,
    NNGPTime,
    Dataset,
)
from nngparareal_tpu.models.base import ModelBase
from nngparareal_tpu.systems.base import ODE
from nngparareal_tpu.solver import SolverAbstr
from nngparareal_tpu.parallel.mesh import shard_fine_fanout


def _block(x):
    return jax.block_until_ready(x)


class Parareal:
    """Parareal(ode, solver, tspan, N, epsilon).run(model=..., ...)."""

    def __init__(self, ode, solver, tspan, N, epsilon=5e-7, verbose="v", **kwargs):
        if not isinstance(ode, ODE):
            raise Exception("ode must be an instance of the ODE class")
        if not isinstance(solver, SolverAbstr):
            raise Exception("solver must be an instance of SolverAbstr")
        self.ode = ode
        self.solver = solver
        self.tspan = tuple(float(x) for x in tspan)
        self.N = int(N)
        self.epsilon = float(epsilon)
        self.verbose = verbose
        self.ode_name = ode.name
        self.n = ode.get_dim()
        self.f = ode.get_vector_field()
        self.u0 = ode.get_init_cond()
        self.runs = {}
        self.fine = None
        self.fine_t = None

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def run(self, model="parareal", cstm_mdl_name=None, add_model=False, **kwargs):
        if isinstance(model, ModelBase):
            mdl = model
        else:
            mdl = self._make_model(model, **kwargs)
        s_time = time.perf_counter()
        out = self._parareal(mdl, **kwargs)
        wall = time.perf_counter() - s_time
        # runtime = solve wall excluding one-time jit compiles (tracked
        # separately as warmup_t/total_wall); the reference's runtime has
        # no compilation component to compare against
        out["timings"]["total_wall"] = wall
        out["timings"]["runtime"] = out["timings"].get("core_t", wall)
        if self.verbose == "v":
            print(f"Elapsed Parareal time: {out['timings']['runtime']:0.2f}s")
        if add_model:
            out["mdl"] = mdl
        name = cstm_mdl_name if cstm_mdl_name is not None else mdl.name
        self.runs[name] = out
        return out

    def _make_model(self, model, **kwargs):
        key = str(model).lower()
        kw = {
            k: v
            for k, v in kwargs.items()
            if k
            in (
                "nn",
                "n_restarts",
                "seed",
                "fatol",
                "xatol",
                "nm_max_iters",
                "optimizer",
                "posterior",
                "grid_refine",
                "grid_walk",
                "grid_polish",
                "grid_logs",
                "score_dtype",
                "strategy",
                "theta",
                "res_size",
                "loss",
                "M",
                "R",
                "alpha",
                "degree",
                "m",
                "nn_iters",
                "reps",
                "calc_detail_avg",
            )
        }
        if key == "parareal":
            return BareParareal(n=self.n, N=self.N)
        if key in ("nngp", "nngparareal"):
            kw.pop("nn_iters", None)
            kw.pop("reps", None)
            return NNGParareal(n=self.n, N=self.N, **kw)
        if key in ("nngp_scipy", "nngp_oracle"):
            from nngparareal_tpu.models.nngp_scipy import NNGPScipy

            for bad in ("optimizer", "grid_refine", "grid_walk", "grid_polish", "grid_logs",
                        "score_dtype", "strategy", "theta", "nn_iters",
                        "reps", "nm_max_iters"):
                kw.pop(bad, None)
            return NNGPScipy(n=self.n, N=self.N, **kw)
        if key in ("gpjax_scipy", "gp_oracle"):
            from nngparareal_tpu.models.gp_scipy import GPScipy

            for bad in ("nn", "optimizer", "posterior", "grid_refine",
                        "grid_walk", "grid_polish", "grid_logs", "score_dtype",
                        "strategy", "nn_iters", "reps", "n_restarts",
                        "nm_max_iters"):
                kw.pop(bad, None)
            return GPScipy(n=self.n, N=self.N, **kw)
        if key in ("gpjax", "gp", "gparareal"):
            for bad in ("nn", "posterior", "grid_refine", "grid_walk", "grid_polish", "strategy",
                        "nn_iters", "reps", "n_restarts"):
                kw.pop(bad, None)
            # run(mesh=...) also shards the GP grid hyperopt's task pool
            # (the reference trains its full-GP tasks over the same MPI
            # pool as the fine solves, models.py:386-421)
            return GParareal(n=self.n, N=self.N, mesh=kwargs.get("mesh"),
                             **kw)
        if key in ("nngp_time", "nngptime"):
            for bad in ("optimizer", "posterior", "grid_refine", "grid_walk", "grid_polish", "grid_logs", "score_dtype", "strategy", "theta"):
                kw.pop(bad, None)
            return NNGPTime(n=self.n, N=self.N, **kw)
        if key in ("knn_mean", "nn_mean", "knnmean"):
            from nngparareal_tpu.models import KNNMean

            for bad in ("optimizer", "posterior", "grid_refine", "grid_walk", "grid_polish", "grid_logs", "score_dtype", "strategy", "theta",
                        "nn_iters", "reps", "n_restarts", "fatol", "xatol",
                        "nm_max_iters"):
                kw.pop(bad, None)
            return KNNMean(n=self.n, N=self.N, **kw)
        if key == "elm":
            kw.setdefault("seed", 47)
            for bad in ("nn", "optimizer", "posterior", "grid_refine", "grid_walk", "grid_polish", "grid_logs", "score_dtype", "strategy",
                        "nn_iters", "reps", "n_restarts", "fatol", "xatol",
                        "nm_max_iters", "theta"):
                kw.pop(bad, None)
            return ELM(n=self.n, N=self.N, **kw)
        raise Exception(f"Unknown model {model!r}")

    # ------------------------------------------------------------------
    # fused kernels
    # ------------------------------------------------------------------

    def _make_fanout(self, mesh):
        """(t0s, t1s, U) -> F-endpoints for all N slices."""
        solver = self.solver
        # resolve fine='auto' NOW (the state dim is known) so the .paged
        # contract check below sees the concrete fan-out
        if hasattr(solver, "resolve_fine"):
            solver.resolve_fine(self.n)
        if mesh is None:
            inner = getattr(solver, "_fine_batch", None)
            if getattr(inner, "paged", False):
                # propagate the paged contract through the bound-method
                # wrapper so the AOT cache keeps page-bounded dispatches
                fan = solver.run_F_batch

                def fanout_paged(t0s, t1s, U):
                    return fan(t0s, t1s, U)

                fanout_paged.paged = True
                fanout_paged.warm = lambda t0s, t1s, U: inner.warm(
                    jnp.asarray(t0s), jnp.asarray(t1s), jnp.asarray(U)
                )
                return fanout_paged
            return solver.run_F_batch

        # Thread the solver's ACTUAL fine arithmetic into the shard_map
        # traceable (advisor round-3 driver.py:215): fine_step_raw
        # dispatches to the ds32 compensated-f32 integrator when fine_ds
        # is set, so mesh= runs the same arithmetic as the single-device
        # path. fine_pallas rides the ds32 XLA path per shard — bitwise-
        # identical to the whole-chunk Pallas kernel (PARITY.md round 3),
        # and shard-shape-agnostic.
        fine_step = solver.fine_step_raw

        def traceable(t0s, t1s, U):
            def one(t0, t1, u):
                return fine_step(t0, t1 - t0, u)

            return jax.vmap(one)(t0s, t1s, U)

        sharded = shard_fine_fanout(traceable, mesh)
        ndev = mesh.devices.size

        def fanout(t0s, t1s, U):
            B = int(U.shape[0])
            pad = (-B) % ndev
            if pad:
                # replicate the last slice (pad may exceed B)
                t0s = jnp.concatenate([t0s, jnp.repeat(t0s[-1:], pad)])
                t1s = jnp.concatenate([t1s, jnp.repeat(t1s[-1:], pad)])
                U = jnp.concatenate([U, jnp.repeat(U[-1:], pad, axis=0)])
            out = sharded(t0s, t1s, U)
            return out[:B] if pad else out

        return fanout

    def _make_sweep(self, model, cap, clip_lo=None, clip_hi=None):
        """Build the fused corrector sweep for the current static config."""
        solver = self.solver
        N = self.N
        t0_glob = self.tspan[0]
        dt_slice = (self.tspan[1] - self.tspan[0]) / N

        def sweep(I, u_init, uG_init, uF_k, uG_k, u_prev, dsX, dsD, dsV, state, aux):
            ds = Dataset(dsX, dsD, dsV)

            def body(u_i, xs):
                i, u_init_ip1, uG_init_ip1, uF_ip1, uG_ip1, aux_i = xs

                def active(u):
                    t_i = t0_glob + i * dt_slice
                    uGn = solver.coarse_step_raw(t_i, dt_slice, u)
                    pred = model.predict_fn(
                        state, ds, u, uF_ip1, uG_ip1, aux_i, i
                    )
                    # graceful degradation: a GP prediction can come out
                    # non-finite when a near-singular local Gram (jitter
                    # 1e-20..1e-12) loses its Cholesky to rounding — the
                    # reference crashes in that event (parareal.py:396-397,
                    # nnGPara_with_time.py:611-613); we fall back to the
                    # classic parareal correction for those coordinates,
                    # which never breaks convergence
                    pred = jnp.where(
                        jnp.isfinite(pred), pred, uF_ip1 - uG_ip1
                    )
                    u_ip1 = pred + uGn
                    # if the coarse solve itself diverged (marginally
                    # stable G hit a bad iterate — the reference crashes
                    # here), reset the iterate to the last fine value:
                    # always finite, convergence merely slows
                    u_ip1 = jnp.where(jnp.isfinite(u_ip1), u_ip1, uF_ip1)
                    uGn = jnp.where(jnp.isfinite(uGn), uGn, uF_ip1 - pred)
                    if clip_lo is not None:
                        # trajectory-informed bounds: garbage iterates far
                        # outside the coarse-init range would blow up both
                        # solvers (the reference crashes there)
                        u_ip1 = jnp.clip(u_ip1, clip_lo, clip_hi)
                    return u_ip1, uGn

                def frozen(u):
                    return u_init_ip1, uG_init_ip1

                u_ip1, uG_ip1_new = lax.cond(i >= I, active, frozen, u_i)
                return u_ip1, (u_ip1, uG_ip1_new)

            xs = (
                jnp.arange(N),
                u_init[1:],
                uG_init[1:],
                uF_k[1:],
                uG_k[1:],
                aux,
            )
            _, (u_tail, uG_tail) = lax.scan(body, u_init[0], xs)
            u_next = jnp.concatenate([u_init[:1], u_tail], axis=0)
            uG_next = jnp.concatenate([uG_init[:1], uG_tail], axis=0)
            err = jnp.max(jnp.abs(u_next - u_prev), axis=1)
            err = err.at[I].set(0.0)
            return u_next, uG_next, err

        return jax.jit(sweep)

    def _make_host_sweep(self, model, cap, clip_lo=None, clip_hi=None,
                         jit_step=True, math_device=None):
        """Host loop over intervals calling one jitted interval step.

        Same contract as ``_make_sweep``. Used when the model's predict
        contains an inner optimisation loop (Nelder-Mead while_loop) that
        some TPU toolchains mis-compile when nested inside a long
        ``lax.scan``; the host loop also skips converged intervals with
        zero device work (exactly like the reference's ``for i in
        range(I, N)``, parareal.py:359-382), at the cost of one dispatch
        per interval.

        ``jit_step=False`` (the ``python`` sweep mode) leaves the interval
        step un-jitted so ``host_only`` models (e.g. the scipy-NM oracle
        NNGPScipy) can run plain numpy/scipy inside predict_fn.

        ``math_device``: run the whole corrector sweep (coarse steps +
        model predict linalg) pinned to this device — the 5e-9 precision
        router: TPU-emulated f64 carries ~49 mantissa bits and loses the
        near-singular late-iteration Cholesky solves, inflating K
        (PARITY.md TPU-backend note); pinning the MODEL math to the CPU's
        IEEE f64 while the fine fan-out stays on-chip recovers the CPU
        column's K. Inputs are transferred in, results transferred back
        to the source device so the fan-out/prep executables never see
        foreign-committed arrays.
        """
        solver = self.solver
        N = self.N
        t0_glob = self.tspan[0]
        dt_slice = (self.tspan[1] - self.tspan[0]) / N

        def step(t_i, u_i, uF_ip1, uG_ip1, dsX, dsD, dsV, state, aux_i, i):
            ds = Dataset(dsX, dsD, dsV)
            uGn = solver.coarse_step_raw(t_i, dt_slice, u_i)
            pred = model.predict_fn(state, ds, u_i, uF_ip1, uG_ip1, aux_i, i)
            # non-finite GP predictions fall back to the classic parareal
            # correction; diverged coarse solves reset the iterate to the
            # last fine value (see _make_sweep)
            pred = jnp.where(jnp.isfinite(pred), pred, uF_ip1 - uG_ip1)
            u_ip1 = pred + uGn
            u_ip1 = jnp.where(jnp.isfinite(u_ip1), u_ip1, uF_ip1)
            uGn = jnp.where(jnp.isfinite(uGn), uGn, uF_ip1 - pred)
            if clip_lo is not None:
                u_ip1 = jnp.clip(u_ip1, clip_lo, clip_hi)
            return u_ip1, uGn

        if jit_step:
            step = jax.jit(step)

        def sweep(I, u_init, uG_init, uF_k, uG_k, u_prev, dsX, dsD, dsV,
                  state, aux):
            I = int(I)
            out_dev = None
            if math_device is not None:
                # pin every input to the math device; committed arguments
                # steer the jitted step's placement there
                leaves = jax.tree_util.tree_leaves(u_prev)
                if leaves and hasattr(leaves[0], "devices"):
                    devs = leaves[0].devices()
                    out_dev = next(iter(devs)) if devs else None
                (u_init, uG_init, uF_k, uG_k, u_prev, dsX, dsD, dsV,
                 state, aux) = jax.device_put(
                    (u_init, uG_init, uF_k, uG_k, u_prev, dsX, dsD, dsV,
                     state, aux), math_device)
            u_rows = [u_init[i] for i in range(I + 1)]
            uG_rows = [uG_init[i] for i in range(I + 1)]
            record = getattr(model, "record_interval_time", None)
            for i in range(I, N):
                aux_i = jax.tree.map(lambda a: a[i], aux)
                tic = time.perf_counter()
                u_ip1, uG_ip1 = step(
                    t0_glob + i * dt_slice, u_rows[i], uF_k[i + 1],
                    uG_k[i + 1], dsX, dsD, dsV, state, aux_i,
                    jnp.asarray(i),
                )
                if record is not None:
                    _block(u_ip1)
                    record(i, time.perf_counter() - tic)
                u_rows.append(u_ip1)
                uG_rows.append(uG_ip1)
            u_next = jnp.stack(u_rows)
            uG_next = jnp.stack(uG_rows)
            err = jnp.max(jnp.abs(u_next - u_prev), axis=1)
            err = err.at[I].set(0.0)
            if out_dev is not None:
                # hand results back on the caller's device: the fan-out /
                # prep executables must not receive math-device-committed
                # arrays
                u_next, uG_next, err = jax.device_put(
                    (u_next, uG_next, err), out_dev)
            return u_next, uG_next, err

        return sweep

    def _measure_serial_fine(self, solver, t, u0):
        """One-off per-slice fine-cost estimate: replicated micro-batch
        (degenerate single-slice long loops are pathological and variable
        on some TPU toolchains), min of two reps (relay-noise robust)."""
        bm = 8 if self.n >= 64 else 64
        reps = []
        for _ in range(2):
            tic = time.perf_counter()
            _block(solver.run_F_batch(
                jnp.full(bm, t[0]), jnp.full(bm, t[1]),
                jnp.tile(u0, (bm, 1)),
            ))
            reps.append(time.perf_counter() - tic)
        return min(reps)

    def _resolve_sweep_mode(self, sweep_mode, model, mesh=None):
        if getattr(model, "host_only", False):
            # numpy/scipy predict (the NNGPScipy oracle): never jitted
            return "python"
        if (getattr(model, "tpu_unsafe_predict", False) and mesh is None
                and sweep_mode != "python"
                and jax.default_backend() not in ("cpu",)):
            # the model's jitted predict program kernel-faults the TPU
            # runtime (measured: NNGPtime's reps x nn_iters batched-NM +
            # top-k refinement crashes the worker in the FIRST warmup
            # sweep — chipqueue.log r4b/r4f, driver.py _block(sweep(...)).
            # Route every on-chip sweep request (scan/host/auto alike)
            # through the CPU-pinned host sweep: model math runs on the
            # host's IEEE f64 while the fine fan-out stays on-chip —
            # the same split the 5e-9 precision router uses.
            if self.verbose == "v" and sweep_mode not in ("auto",
                                                          "host_cpu"):
                print(f"[driver] sweep_mode={sweep_mode!r} overridden to "
                      f"'host_cpu': {type(model).__name__} predict is "
                      f"TPU-unsafe (kernel fault)")
            return "host_cpu"
        if sweep_mode != "auto":
            return sweep_mode
        # 5e-9 precision router: TPU f64 is emulated at ~49 mantissa bits
        # and loses the near-singular late-iteration model solves (K
        # inflates — PARITY.md TPU-backend note). At tight tolerances,
        # models that do GP linalg run the corrector sweep on the CPU's
        # IEEE f64 (the fine fan-out stays on-chip). Opt out with an
        # explicit sweep_mode=. Mesh runs keep the scan sweep: routing
        # would fight the GP task-pool sharding (models/gp.py mesh=).
        if (self.epsilon < 1e-8 and model.needs_dataset and mesh is None
                and jax.default_backend() not in ("cpu",)):
            return "host_cpu"
        # all built-in models are scan-safe: the NM mode uses the
        # fixed-iteration fori_loop Nelder-Mead (ops/optim.py
        # nelder_mead_fixed), so the while-in-scan TPU miscompile that
        # used to force a host sweep for it no longer applies
        return "scan"

    # ------------------------------------------------------------------
    # the main loop
    # ------------------------------------------------------------------

    @staticmethod
    def _windowed_valid(valid, N, k, I, lag_k):
        """v2-style lag_k training window (reference new_lib.py:980-987):
        keep only rows from iterations [k+1-lag_k, k] with slice >= I."""
        cap = valid.shape[0]
        idx = jnp.arange(cap)
        kk = idx // N
        slice_i = idx % N
        keep = (kk >= max(k + 1 - lag_k, 0)) & (kk <= k) & (slice_i >= I)
        return valid * keep.astype(valid.dtype)

    def _parareal(
        self,
        model,
        early_stop=None,
        store_int=False,
        keep_history=False,
        debug=False,
        cap_iters=None,
        mesh=None,
        warmup=True,
        measure_serial_fine=True,
        lag_k=None,
        sweep_mode="auto",
        sync_mode="attrib",
        clip_iterates=True,
        comp_models=None,
        int_dir="",
        int_name=None,
        _resume=None,
        **kwargs,
    ):
        N, n, eps = self.N, self.n, self.epsilon
        verbose = kwargs.get("verbose", self.verbose)
        solver = self.solver
        t = np.linspace(self.tspan[0], self.tspan[1], N + 1)
        t_dev = jnp.asarray(t)
        dt_slice = (t[-1] - t[0]) / N

        fanout = self._make_fanout(mesh)
        sweep_cache = {}
        sweep_mode = self._resolve_sweep_mode(sweep_mode, model, mesh)
        # sync_mode='fast': drop the per-phase device syncs inside the
        # k-loop (each is a host round-trip — ~30-50 ms through the axon
        # relay) and sync ONCE per iteration at the convergence check.
        # The fan-out, data-append and sweep dispatches then pipeline on
        # the device. Costs per-phase timing attribution: the fused
        # iteration wall is booked in `fused_iter_t` and the F/sweep/mdl
        # splits only carry dispatch time (timings['sync_mode'] records
        # which accounting applies). Only meaningful for the fused scan
        # sweep; debug forces 'attrib'.
        fast_sync = (sync_mode == "fast" and sweep_mode == "scan"
                     and not debug)

        def get_sweep(cap, sig):
            key = (cap, sig)
            if key not in sweep_cache:
                if sweep_mode == "python":
                    sweep_cache[key] = self._make_host_sweep(
                        model, cap, clip_bounds[0], clip_bounds[1],
                        jit_step=False,
                    )
                elif sweep_mode == "host_cpu":
                    sweep_cache[key] = self._make_host_sweep(
                        model, cap, clip_bounds[0], clip_bounds[1],
                        math_device=jax.devices("cpu")[0],
                    )
                else:
                    make = (
                        self._make_host_sweep
                        if sweep_mode == "host"
                        else self._make_sweep
                    )
                    sweep_cache[key] = make(model, cap, clip_bounds[0],
                                            clip_bounds[1])
            return sweep_cache[key]

        # shadow comparison models (reference Figure_2.py comp_mdls
        # harness): fitted on the same data each iteration, batch-predict
        # every active interval post-sweep, errors recorded vs true F
        shadows = []
        if comp_models:
            debug = True
            for spec in comp_models:
                if isinstance(spec, ModelBase):
                    nm, mdl = spec.name, spec
                elif isinstance(spec, str):
                    nm, mdl = spec, self._make_model(spec)
                else:
                    nm, skw = spec
                    mdl = self._make_model(nm, **skw)
                    nm = skw.get("cstm_name", f"{nm}:{mdl.name}")
                shadows.append([nm, mdl, {}])
        shadow_errs = {nm: [] for nm, _, _ in shadows}

        collect_data = model.needs_dataset or bool(shadows)
        cap0 = N * max(1, min(N, 32 if cap_iters is None else int(cap_iters)))
        ds = Dataset.empty(cap0 if collect_data else N, n)

        u0_dev = jnp.asarray(self.u0)

        # trajectory-informed iterate bounds (used by clip_iterates):
        # computed from the coarse-init trajectory with a 3x range margin
        clip_bounds = [None, None]
        if clip_iterates:
            uG_probe = _block(solver.run_G_chain(t_dev, u0_dev))
            lo = jnp.min(uG_probe, axis=0)
            hi = jnp.max(uG_probe, axis=0)
            rng_ = jnp.maximum(hi - lo, 1e-6)
            clip_bounds = [lo - 3.0 * rng_, hi + 3.0 * rng_]

        # fan-out size buckets (smallest first): the active tail shrinks as
        # slices converge; four sizes bound recompiles while capturing most
        # of the saved work
        fan_buckets = sorted({max(N // 8, 1), max(N // 4, 1),
                              max(N // 2, 1), N})

        @jax.jit
        def prep_step(u, uF, uG, dsX, dsD, dsV, I, offset):
            """Freeze the newly converged slice and append the iteration's
            (state, defect) rows in one fused program."""
            u_init = u.at[I + 1].set(uF[I + 1])
            valid_new = (jnp.arange(N) >= I).astype(dsV.dtype)
            zero = jnp.zeros((), dtype=offset.dtype)
            dsX = lax.dynamic_update_slice(dsX, u[:-1], (offset, zero))
            dsD = lax.dynamic_update_slice(dsD, uF[1:] - uG[1:], (offset, zero))
            dsV = lax.dynamic_update_slice(dsV, valid_new, (offset,))
            return u_init, dsX, dsD, dsV

        # --- AOT compile caches (exclude compiles from timings exactly) ---
        # Compiles are measured via jit.lower(...).compile() — compile alone,
        # no discarded warm execution — and the compiled executable is cached
        # and invoked directly thereafter. With adaptive nn the sweep's
        # static signature changes every iteration; the old
        # compile-run-then-rerun pattern would have silently re-executed the
        # full corrector sweep once per iteration and booked the first (real)
        # execution as compile time.
        lazy_compile_t = 0.0
        fan_compiled = {}
        sweep_compiled = {}

        def _aot_caller(jitted, args):
            """AOT-compile for these arg avals and return a caller.

            Env NNGP_TPU_NO_AOT=1 bypasses AOT (plain jit dispatch):
            diagnostic/workaround knob for toolchains where AOT-compiled
            executables misbehave; costs only the compile-time attribution
            accuracy (warm execution is booked as compile).

            Unlike the jit dispatch path, a ``Compiled`` executable rejects
            committed arguments whose sharding differs from what it was
            lowered with (e.g. replicated warmup dummies vs mesh-sharded
            loop arrays), so the caller re-binds each leaf to the
            executable's expected input sharding — a no-op on a single
            device, the same reshard jit would have inserted on a mesh."""
            if os.environ.get("NNGP_TPU_NO_AOT") == "1":
                return jitted
            c = jitted.lower(*args).compile()
            # one sharding spec per top-level argument (None = any)
            shardings = list(c.input_shardings[0])
            if len(shardings) != len(args):
                return c

            def call(*a):
                a = tuple(
                    x if s is None or s == () else jax.device_put(x, s)
                    for x, s in zip(a, shardings)
                )
                return c(*a)

            return call

        def ensure_fan_compiled(args, book=True):
            """AOT-compile the fan-out for this batch size (once)."""
            nonlocal lazy_compile_t
            B = int(args[2].shape[0])
            c = fan_compiled.get(B)
            if c is None:
                tic = time.perf_counter()
                if getattr(fanout, "paged", False):
                    # paged host loop: jitting it would fuse every page
                    # into ONE huge executable — voiding the bounded-
                    # dispatch contract (ops/rk.py) and producing exactly
                    # the long single executable that kernel-faults the
                    # axon worker. Build the page executables via warm
                    # instead (the page execution is booked as compile —
                    # approximate, like NNGP_TPU_NO_AOT).
                    w = getattr(fanout, "warm", None)
                    if w is not None:
                        out = w(*args)
                        np.asarray(jax.tree_util.tree_leaves(out)[0])
                    c = fanout
                else:
                    try:
                        jf = (fanout if hasattr(fanout, "lower")
                              else jax.jit(fanout))
                        c = _aot_caller(jf, args)
                    except Exception:
                        # non-jittable backend (e.g. ScipySolver host loop)
                        c = fanout
                fan_compiled[B] = c
                if book:
                    lazy_compile_t += time.perf_counter() - tic
            return c

        def ensure_sweep_compiled(key, sweep, args, book=True):
            """AOT-compile the corrector sweep for this (capacity,
            signature) key (once). Host/python sweeps pass through."""
            nonlocal lazy_compile_t
            c = sweep_compiled.get(key)
            if c is None:
                if sweep_mode != "scan":
                    sweep_compiled[key] = sweep
                    return sweep
                tic = time.perf_counter()
                try:
                    c = _aot_caller(sweep, args)
                except Exception:
                    c = sweep
                sweep_compiled[key] = c
                if book:
                    lazy_compile_t += time.perf_counter() - tic
            return c

        # --- warmup (exclude compiles from timings) ---
        # warmup_split attributes the warmup wall per phase (round-5
        # VERDICT item 6: the flagship bench's 612 s "jit_compile_s" was
        # opaque — fan/sweep XLA compiles vs relay executable loads vs
        # real warm executions booked as compile)
        warmup_split = {}

        def _wphase(name, t0):
            warmup_split[name] = round(time.perf_counter() - t0, 3)
            return time.perf_counter()

        warmup_t0 = time.perf_counter()
        if warmup:
            tic_w = warmup_t0
            ensure_fan_compiled(
                (t_dev[:-1], t_dev[1:], jnp.tile(u0_dev, (N, 1))), book=False
            )
            tic_w = _wphase("fan_compile", tic_w)
            _block(solver.run_G_chain(t_dev, u0_dev))
            tic_w = _wphase("g_chain", tic_w)
            if measure_serial_fine:
                # serial-fine cost estimator: replicated micro-batch.
                # Degenerate single-slice long loops are pathological AND
                # wildly variable on some TPU toolchains; the batch-8 wall
                # is stable and is a strict LOWER bound on the true serial
                # per-slice cost (a real serial run cannot batch), so the
                # reported speedups are conservative.
                bm = 8 if self.n >= 64 else 64
                _block(solver.run_F_batch(
                    jnp.full(bm, t[0]), jnp.full(bm, t[1]),
                    jnp.tile(u0_dev, (bm, 1)),
                ))
                tic_w = _wphase("serial_fine_warm", tic_w)
            saved = model.get_ckpt_state()
            if model.needs_dataset:
                if sweep_mode == "host_cpu":
                    # warm the SAME executables the loop will use: the
                    # precision router runs fits on the CPU device — a
                    # plain warmup fit would compile (and execute) the
                    # never-reused TPU fit family instead
                    cpu0 = jax.devices("cpu")[0]
                    ds_w = Dataset(*jax.device_put(
                        (ds.X, ds.D, ds.valid), cpu0))
                    with jax.default_device(cpu0):
                        model.fit(ds_w, 0)
                else:
                    model.fit(ds, 0)
                tic_w = _wphase("warmup_fit", tic_w)
            aux = model.sweep_aux(0, N, ds.capacity)
            if aux is None:
                aux = jnp.zeros((N, 1))
            wkey = (ds.capacity, model.static_signature(0))
            sweep = get_sweep(*wkey)
            dummy = jnp.tile(u0_dev, (N + 1, 1))
            # NOTE: I must be passed exactly like the main loop does
            # (weak-typed) or the AOT executable rejects the call
            wargs = (
                jnp.asarray(0), dummy, dummy, dummy, dummy, dummy,
                ds.X, ds.D, ds.valid, model.state_pytree(), aux,
            )
            if sweep_mode == "scan":
                ensure_sweep_compiled(wkey, sweep, wargs, book=False)
            else:
                # host/python sweeps compile their inner jitted step by
                # executing once
                _block(sweep(*wargs))
            # restores the pre-warmup rng stream too (rng_state in the
            # ckpt state), so warmup draws stay invisible to the run AND
            # a resumed stream is not clobbered back to the seed
            model.set_ckpt_state(saved)
            _wphase("sweep_compile", tic_w)
        warmup_t = time.perf_counter() - warmup_t0
        core_t0 = time.perf_counter()

        timings = {}
        G_time = 0.0
        F_time = 0.0
        F_time_serial = 0.0
        sweep_time = 0.0
        fused_iter_t = 0.0

        # --- coarse init chain (parareal.py:264-277) ---
        tic = time.perf_counter()
        uG = _block(solver.run_G_chain(t_dev, u0_dev))
        g_chain_t = time.perf_counter() - tic
        G_time += g_chain_t
        u = uG
        uF = uG  # placeholder; row 0 = u0 is what matters
        I = 0
        k_done = 0
        converged = False
        err_cols = []
        conv_int = []
        hist_u, hist_uG, hist_uF = [], [], []
        debug_dict = {}
        mean_errs, max_errs, one_step_error, all_pred_err = [], [], [], []

        per_slice_fine_t = None

        loop_start = 0
        if _resume is not None:
            (u, uG, uF, I, loop_start, err_cols, conv_int, ds,
             G_time, F_time, F_time_serial, sweep_time) = _resume
            u, uG, uF = jnp.asarray(u), jnp.asarray(uG), jnp.asarray(uF)
            if I >= N:
                raise Exception("System has already converged")

        if keep_history:
            hist_u.append(np.asarray(u))

        for k in range(loop_start, N):
            if verbose == "v":
                print(f"{self.ode_name} {model.name} iteration number (out of {N}): {k + 1} ")

            # --- 1. fine fan-out over the active tail of slices ---
            # the converged prefix is frozen; integrate only the smallest
            # power-of-two tail covering [I, N) (recomputing a few frozen
            # slices is bitwise harmless and keeps compiles to O(log N),
            # while the wall-clock tracks the true remaining work — the
            # reference fans out exactly the unconverged slices,
            # parareal.py:310-315)
            Bk = next(b for b in fan_buckets if b >= N - I)
            start = N - Bk
            fan_args = (t_dev[start:N], t_dev[start + 1 : N + 1], u[start:N])
            fan_exec = ensure_fan_compiled(fan_args)

            if (fast_sync and measure_serial_fine
                    and per_slice_fine_t is None):
                # fast mode: measure the one-off serial-fine estimate
                # BEFORE the fan dispatch — its two blocked reps would
                # otherwise land inside the k=0 fused window and inflate
                # fused_iter_t by ~2 fan-out walls
                per_slice_fine_t = self._measure_serial_fine(
                    solver, t, u[0])

            tic = time.perf_counter()
            iter_tic = tic
            sub = fan_exec(*fan_args)
            if not fast_sync:
                sub = _block(sub)
            F_time += time.perf_counter() - tic
            if start == 0:
                uF = jnp.concatenate([u[:1], sub], axis=0)
            else:
                uF = uF.at[start + 1 : N + 1].set(sub)

            if measure_serial_fine and per_slice_fine_t is None:
                per_slice_fine_t = self._measure_serial_fine(
                    solver, t, u[0])
            if per_slice_fine_t is not None:
                F_time_serial += per_slice_fine_t

            # --- 2. freeze slice I+1; collect data (parareal.py:330-339) ---
            # one fused jitted call instead of ~6 eager dispatches
            uG_init = uG
            if collect_data and (k + 1) * N > ds.capacity:
                ds = ds.grown(2 * ds.capacity)
            u_init, dsX, dsD, dsV = prep_step(
                u, uF, uG, ds.X, ds.D, ds.valid,
                jnp.asarray(I), jnp.asarray(k * N),
            )
            I += 1
            if collect_data:
                ds = Dataset(dsX, dsD, dsV)
            if os.environ.get("NNGP_TPU_PARANOID_SYNC") == "1":
                # crash-site pinpointing: surface any async kernel fault
                # from the fan-out/prep executables HERE rather than at the
                # next model-fit sync
                _block((u_init, dsX, dsD, dsV))
                print(f"[sync] k={k} prep_step ok", flush=True)

            # --- early stop: only one interval was missing ---
            if I == N:
                if verbose == "v":
                    print("WARNING: early stopping")
                err = np.array(jnp.max(jnp.abs(u_init - u), axis=1))
                err[-1] = np.nextafter(eps, 0)
                err_cols.append(err)
                conv_int.append(I)
                u, uF_last = u_init, uF
                k_done = k + 1
                converged = True
                if keep_history:
                    hist_u.append(np.asarray(u))
                break

            # --- 3. model fit (parareal.py:351) ---
            if lag_k is not None and collect_data:
                ds_fit = Dataset(
                    ds.X, ds.D,
                    self._windowed_valid(ds.valid, N, k, I, int(lag_k)),
                )
            else:
                ds_fit = ds
            tic = time.perf_counter()
            if sweep_mode == "host_cpu":
                # precision router: the fit's Gram/Cholesky linalg runs on
                # IEEE-f64 CPU (see _make_host_sweep math_device)
                cpu0 = jax.devices("cpu")[0]
                ds_fit = Dataset(*jax.device_put(
                    (ds_fit.X, ds_fit.D, ds_fit.valid), cpu0))
                with jax.default_device(cpu0):
                    model.fit(ds_fit, k)
            else:
                model.fit(ds_fit, k)
            st = model.state_pytree()
            if st is not None and not fast_sync:
                _block(st)
            model.add_train_time(k, time.perf_counter() - tic)

            # --- 4. fused corrector sweep (parareal.py:359-382) ---
            aux = model.sweep_aux(k, N, ds.capacity)
            if aux is None:
                aux = jnp.zeros((N, 1))
            sweep_key = (ds.capacity, model.static_signature(k))
            sweep = get_sweep(*sweep_key)
            sweep_args = (
                jnp.asarray(I), u_init, uG_init, uF, uG, u,
                ds_fit.X, ds_fit.D, ds_fit.valid, model.state_pytree(), aux,
            )
            sweep_exec = ensure_sweep_compiled(sweep_key, sweep, sweep_args)
            tic = time.perf_counter()
            try:
                u_next, uG_next, err_dev = _block(sweep_exec(*sweep_args))
            except (TypeError, ValueError):
                # aval/sharding drift under an unchanged (capacity,
                # signature) key — a Compiled executable rejects such
                # calls with TypeError/ValueError. Anything else (device
                # faults, UNAVAILABLE, OOM) must propagate, not trigger a
                # silent recompile against a possibly-wedged chip.
                if sweep_exec is sweep:
                    raise
                # recompile via the jitted path and refresh the cache
                tic_c = time.perf_counter()
                sweep_compiled[sweep_key] = _aot_caller(sweep, sweep_args)
                lazy_compile_t += time.perf_counter() - tic_c
                tic = time.perf_counter()
                u_next, uG_next, err_dev = _block(
                    sweep_compiled[sweep_key](*sweep_args)
                )
            dt_sweep = time.perf_counter() - tic
            if fast_sync:
                # the sweep sync is the iteration's ONE device sync: this
                # wall covers the pipelined fan-out + prep + fit-state +
                # sweep device work since iter_tic
                fused_iter_t += time.perf_counter() - iter_tic
            else:
                sweep_time += dt_sweep
                # attribute sweep wall between the sequential coarse chain
                # and the model: estimate G from the measured init chain,
                # prorated by the active-slice fraction (lax.cond skips
                # frozen slices)
                g_est = g_chain_t * (N - I) / N
                G_time += g_est
                model.add_pred_time(k, max(0.0, dt_sweep - g_est),
                                    n_active=N - I)

            # NaN guard rides the (already transferred) err vector: a NaN
            # in uG_next propagates into u_next and hence err
            # (reference parareal.py:396-397)

            # --- debug: model-vs-truth errors (parareal.py:353-393) ---
            if debug:
                truth_tail = _block(fanout(t_dev[:-1], t_dev[1:], u_next[:-1]))
                pe = np.asarray(jnp.abs(truth_tail - u_next[1:]))[I:]
                mean_errs.append(pe.mean(axis=0))
                max_errs.append(pe.max(axis=0))
                all_pred_err.append(pe)
                if verbose == "v":
                    print(f"Avg error {pe.mean(axis=0)}, Max. error {pe.max(axis=0)}")
                for entry in shadows:
                    nm, mdl, cache = entry
                    mdl.fit(ds_fit, k)
                    skey = (ds.capacity, mdl.static_signature(k))
                    if skey not in cache:
                        def _make_batch_pred(mdl):
                            def batch_pred(dsX, dsD, dsV, state, qs, uFs,
                                           uGs, auxs, idxs):
                                dsl = Dataset(dsX, dsD, dsV)
                                return jax.vmap(
                                    lambda q_, f_, g_, a_, i_:
                                    mdl.predict_fn(state, dsl, q_, f_, g_,
                                                   a_, i_)
                                )(qs, uFs, uGs, auxs, idxs)
                            return jax.jit(batch_pred)
                        cache[skey] = _make_batch_pred(mdl)
                    saux = mdl.sweep_aux(k, N, ds.capacity)
                    if saux is None:
                        saux = jnp.zeros((N, 1))
                    spreds = cache[skey](
                        ds_fit.X, ds_fit.D, ds_fit.valid,
                        mdl.state_pytree(), u_next[:-1], uF[1:], uG[1:],
                        saux, jnp.arange(N),
                    )
                    serr = np.asarray(
                        jnp.abs(spreds + uG_next[1:] - truth_tail)
                    )[I:]
                    shadow_errs[nm].append(serr)

            # --- 5. convergence check + prefix freeze (parareal.py:399-416) ---
            err = np.asarray(err_dev)
            if np.isnan(err).any():
                raise Exception(
                    "NaN values in initial coarse solve - increase Ng!"
                )
            if debug:
                one_step_error.append([err[I + 1], float(np.max(all_pred_err[-1]))])
            for p in range(I + 1, N + 1):
                if err[p] < eps:
                    I += 1
                else:
                    break
            if verbose == "v":
                print("--> Converged:", I)
            err_cols.append(err)
            conv_int.append(I)

            u, uG = u_next, uG_next
            k_done = k + 1
            if keep_history:
                hist_u.append(np.asarray(u))

            if store_int:
                self._store_int(
                    model, k, I, u, uG, uF, err_cols, conv_int, ds,
                    G_time, F_time, F_time_serial, sweep_time,
                    int_dir=int_dir, int_name=int_name,
                )

            if I == N:
                converged = True
                break
            if early_stop is not None and k == early_stop - 1:
                if verbose == "v":
                    print("Early stopping due to user condition.")
                break

        # --- outputs ---
        err_arr = np.stack(err_cols, axis=1) if err_cols else np.zeros((N + 1, 0))
        if collect_data:
            mask = np.asarray(ds.valid) > 0
            x_out = np.asarray(ds.X)[mask]
            D_out = np.asarray(ds.D)[mask]
        else:
            x_out = np.zeros((0, n))
            D_out = np.zeros((0, n))

        timings = {
            "F_time": F_time,
            "G_time": G_time,
            "G_init_time": g_chain_t,
            "sweep_time": sweep_time,
            "F_time_serial_avg": F_time_serial,
            # one-time jit compiles (the reference pays none; its runtime
            # has no analogue of this)
            "warmup_t": warmup_t + lazy_compile_t,
            # per-phase warmup attribution (compile vs warm-execution);
            # in-loop lazy compiles are the separate lazy_compile_t term
            "warmup_split": dict(warmup_split,
                                 lazy_compile=round(lazy_compile_t, 3)),
            # wall clock of the solve proper: coarse init + k-loop,
            # excluding jit compiles and the one-off single-slice
            # serial-fine measurement
            "core_t": time.perf_counter() - core_t0
            - (per_slice_fine_t or 0.0) - lazy_compile_t,
            # sync accounting: 'attrib' = per-phase device syncs, splits
            # exact; 'fast' = one sync per iteration, the fused
            # fan+prep+fit+sweep device wall lands in fused_iter_t and
            # the per-phase splits carry dispatch time only
            "sync_mode": "fast" if fast_sync else "attrib",
            "fused_iter_t": fused_iter_t,
            # resolved sweep mode (esp. 'host_cpu' — the 5e-9 precision
            # router): artifact scripts must read it here, not re-derive
            # the routing rule
            "sweep_mode": sweep_mode,
        }
        timings.update(model.get_times())
        if fast_sync:
            # the fused window ALREADY contains the fan dispatch (F_time)
            # and the host-side model fit wall (mdl_train_t syncs via its
            # own np.array transfers) — subtracting them again would clamp
            # overhead to a meaningless 0
            timings["overhead_t"] = max(
                0.0, timings["core_t"] - g_chain_t - fused_iter_t,
            )
        else:
            timings["overhead_t"] = max(
                0.0,
                timings["core_t"] - F_time - g_chain_t - sweep_time
                - timings["mdl_train_t"],
            )

        if debug:
            debug_dict = {
                "one_step_error": np.array(one_step_error),
                "all_pred_err": all_pred_err,
                "mean_errs": mean_errs,
                "max_errs": max_errs,
            }
            if shadows:
                debug_dict["err_store_mdls"] = shadow_errs

        out = {
            "t": t,
            "u": np.asarray(u),
            "err": err_arr,
            "x": x_out,
            "D": D_out,
            "k": k_done,
            "timings": timings,
            "debug_dict": debug_dict,
            "converged": converged,
            "conv_int": conv_int,
        }
        if keep_history:
            out["u_hist"] = np.stack(hist_u, axis=2)
        return out

    # ------------------------------------------------------------------
    # checkpoint / resume (reference parareal.py:114-209, 420-431)
    # ------------------------------------------------------------------

    def _store_int(
        self, model, k, I, u, uG, uF, err_cols, conv_int, ds,
        G_time, F_time, F_time_serial, sweep_time, int_dir="", int_name=None,
    ):
        name_base = int_name or f"{self.ode_name}_{self.N}_{model.name}_int"
        path = os.path.join(int_dir, name_base)
        os.makedirs(path, exist_ok=True)
        payload = {
            "k": k,
            "I": I,
            "u": np.asarray(u),
            "uG": np.asarray(uG),
            "uF": np.asarray(uF),
            "err_cols": [np.asarray(e) for e in err_cols],
            "conv_int": list(conv_int),
            "ds_X": np.asarray(ds.X),
            "ds_D": np.asarray(ds.D),
            "ds_valid": np.asarray(ds.valid),
            "G_time": G_time,
            "F_time": F_time,
            "F_time_serial": F_time_serial,
            "sweep_time": sweep_time,
            "model_name": model.name,
            "model_state": model.get_ckpt_state(),
            "tspan": self.tspan,
            "N": self.N,
            "epsilon": self.epsilon,
            "ode_name": self.ode_name,
        }
        with open(os.path.join(path, f"{name_base}_{k}"), "wb") as fh:
            pickle.dump(payload, fh, pickle.HIGHEST_PROTOCOL)

    def load_int_dump(self, ckpt_path, model="parareal", cstm_mdl_name=None, **kwargs):
        """Resume a run from a per-iteration checkpoint file."""
        with open(ckpt_path, "rb") as fh:
            p = pickle.load(fh)
        if p["ode_name"] != self.ode_name or p["N"] != self.N:
            raise Exception("Checkpoint does not match this Parareal instance")
        mdl = model if isinstance(model, ModelBase) else self._make_model(model, **kwargs)
        if mdl.name != p["model_name"]:
            raise Exception(
                f"Checkpoint was written by model {p['model_name']}, got {mdl.name}"
            )
        mdl.set_ckpt_state(p["model_state"])
        base_time = p["G_time"] + p["F_time"] + mdl.get_times()["mdl_tot_t"]
        ds = Dataset(
            jnp.asarray(p["ds_X"]), jnp.asarray(p["ds_D"]), jnp.asarray(p["ds_valid"])
        )
        resume = (
            p["u"], p["uG"], p["uF"], p["I"], p["k"] + 1,
            [np.asarray(e) for e in p["err_cols"]], list(p["conv_int"]), ds,
            p["G_time"], p["F_time"], p["F_time_serial"], p["sweep_time"],
        )
        s_time = time.perf_counter()
        out = self._parareal(mdl, _resume=resume, **kwargs)
        out["timings"]["runtime"] = time.perf_counter() - s_time + base_time
        name = cstm_mdl_name if cstm_mdl_name is not None else mdl.name
        self.runs[name] = out
        return out

    # ------------------------------------------------------------------
    # reporting / plotting — delegated
    # ------------------------------------------------------------------

    def build_cont_traj(self, key=None):
        if key is None:
            if len(self.runs) != 1:
                raise Exception("Multiple runs, must specify key")
            key = list(self.runs.keys())[0]
        if isinstance(key, dict) and "t" in key and "u" in key:
            t, u = key["t"], key["u"]
        else:
            t, u = self.runs[key]["t"], self.runs[key]["u"]
        u_full = []
        for i in range(self.N):
            traj = np.asarray(self.solver.run_F_full(t[i], t[i + 1], u[i, :]))
            u_full.append(traj)
        return np.vstack(u_full)

    def store(self, name, path="", slim=False):
        """Dump this solver's runs as a result artifact (the reference
        pickles the whole Parareal object, parareal.py:114-139; here the
        unpicklable device state is left out by construction).

        slim=True strips bulky arrays like the reference's
        preprocessing.py repo-slimming pass.
        """
        from nngparareal_tpu.utils.io import store_pickle, slim_run

        runs = {
            k: (slim_run(v) if slim else v) for k, v in self.runs.items()
        }
        payload = {
            "ode_name": self.ode_name,
            "tspan": self.tspan,
            "N": self.N,
            "epsilon": self.epsilon,
            "n": self.n,
            "runs": runs,
            "fine_t": self.fine_t,
        }
        store_pickle(payload, name, path)
        return payload

    def clear_plot_obj(self):
        self.runs = {}

    def print_times(self, *args, **kwargs):
        from nngparareal_tpu.reporting import print_times

        return print_times(self, *args, **kwargs)

    def print_speedup(self, *args, **kwargs):
        from nngparareal_tpu.reporting import print_speedup

        return print_speedup(self, *args, **kwargs)

    def plot(self, *args, **kwargs):
        from nngparareal_tpu.reporting import plot_run

        return plot_run(self, *args, **kwargs)

    def plot_all_err(self, *args, **kwargs):
        from nngparareal_tpu.reporting import plot_all_err

        return plot_all_err(self, *args, **kwargs)


class PararealLight(Parareal):
    """API-parity alias: the engine is already rolling-state O(N n)
    (the reference's PararealLight, parareal.py:782-1071). History capture
    and intermediate dumps are disabled like the reference."""

    def _parareal(self, model, **kwargs):
        kwargs["keep_history"] = False
        if kwargs.get("store_int"):
            raise NotImplementedError(
                "PararealLight does not support storing intermediate results"
            )
        return super()._parareal(model, **kwargs)

    def load_int_dump(self, *args, **kwargs):
        raise NotImplementedError(
            "PararealLight does not support loading from intermediate dumps"
        )
