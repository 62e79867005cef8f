"""nnGParareal: per-query nearest-neighbour local GPs (the paper's method).

Reference models.py:98-270 (NNGP_p). For every prediction point the m
nearest dataset rows (sq-euclidean) form a local GP per state coordinate;
hyperparameters (log10-scale SE kernel, reference models.py:145-148) are
chosen by minimising the Cholesky NLL over (coordinate x 9 jitters x
n_restarts) tasks from random integer starts in [-8, 0)
(reference models.py:185-226).

TPU-native redesign: neighbour selection is masked distances + lax.top_k;
the task fan-out the reference ships to an MPI pool becomes ONE batched
Nelder-Mead whose every iteration is a single (B*C, m, m) batched Cholesky;
the whole prediction is a pure function fused into the driver's sweep scan.
Per-task selection keeps the reference's rule, which reduces to the global
NLL argmin per coordinate (the 0.9*min mask in models.py:212-215 never
excludes the argmin).
"""

import numpy as np
import jax
import jax.numpy as jnp

from nngparareal_tpu.models.base import ModelBase
from nngparareal_tpu.ops import gp as gpops
from nngparareal_tpu.ops import gp_lanes as gplanes
from nngparareal_tpu.ops.nn_select import nearest_neighbors
from nngparareal_tpu.ops.optim import nelder_mead, nelder_mead_fixed

class NNGParareal(ModelBase):
    name = "NNGP"

    def __init__(
        self,
        n,
        N,
        nn="adaptive",
        n_restarts=1,
        seed=45,
        fatol=None,
        xatol=None,
        nm_max_iters=200,
        optimizer="nm",
        grid_refine=2,
        grid_walk=4,
        strategy="nn",
        score_dtype=None,
        selector="nll",
        loo_top=12,
        loo_window=3.0,
        **kwargs,
    ):
        super().__init__(n, N, **kwargs)
        self.nn = nn
        self.n_restarts = int(n_restarts)
        self.seed = int(seed)
        self.rng = np.random.default_rng(self.seed)
        self.fatol = 1e-1 if fatol is None else float(fatol)
        self.xatol = 1e-1 if xatol is None else float(xatol)
        self.nm_max_iters = int(nm_max_iters)
        # 'nm': batched Nelder-Mead from random integer starts (parity with
        # the reference, models.py:185-226). 'grid': dense integer-grid NLL
        # search over the same support [-8,0)^2 plus `grid_refine` local
        # halving refinements — deterministic straight-line code (no inner
        # while_loop), the BASELINE.json north-star formulation.
        self.optimizer = str(optimizer)
        self.grid_refine = int(grid_refine)
        self.grid_walk = int(grid_walk)
        # >0: replace the walk/refine rounds with a fixed-iteration
        # batched Nelder-Mead polish per (coord x jitter) from the grid
        # argmin (see _grid_shared); the deterministic equivalent of the
        # reference's scipy NM tasks
        self.grid_polish = int(kwargs.pop("grid_polish", 0))
        # candidate selection among the grid's NLL evaluations:
        # 'nll'  — per-coordinate NLL argmin (reference models.py:207-215);
        # 'loo'  — among candidates within ``loo_window`` nats of the best
        #          NLL (top ``loo_top`` checked), pick the one with the
        #          smallest closed-form leave-one-out squared residual.
        #          Near-tied NLL basins can differ wildly in predictive
        #          quality (the Hopf failure mode); LOO measures prediction
        #          error directly.
        self.selector = str(selector)
        self.loo_top = int(loo_top)
        self.loo_window = float(loo_window)
        # posterior solve: 'chol' (default; lane-major Cholesky — NaNs at
        # the exact-singular boundary fall back to the bare correction in
        # the driver) or 'lu' (partial-pivoted solve like the reference's
        # np.linalg.solve predict, models.py:177-183+434-445 — keeps
        # boundary interpolants; CPU-only: XLA's TPU LuDecomposition has
        # no f64). With exact pairwise distances (ops/gp.py) the chol
        # path already reaches published K on every system; 'lu' remains
        # as the reference-behavior research option.
        self.posterior = str(kwargs.pop("posterior", "chol"))
        # neighbour-selection strategy over the (iteration, slice) data
        # grid: 'nn' (the paper's method) or one of the research variants
        # of reference nnGPara_with_time.py:27-184 — 'col_only', 'col+rnd',
        # 'row_col', 'row', 'col_full'. The padded dataset's row index
        # encodes (iteration, slice) as kk*N + i, so every variant is a
        # penalty function + top_k.
        self.strategy = str(strategy)
        if self.strategy != "nn":
            self.name = "NNGP" + self.strategy
        self.rng2 = np.random.default_rng(int(seed))
        # optional down-cast for hyperparameter *scoring* only (ranking
        # candidates); the posterior mean always runs f64
        self.score_dtype = score_dtype
        # per-(iteration, interval) timing detail (reference
        # models.py:119-143: calc_detail_avg / calc_parall_overhead).
        # Populated by the host sweep (sweep_mode='host'); the fused scan
        # sweep cannot attribute per-interval wall time.
        self.calc_detail_avg = bool(kwargs.get("calc_detail_avg", False))
        self.detail_avg = np.zeros((N, N)) if self.calc_detail_avg else None
        self.tot_train_t = 0.0
        self.train_count = 0
        self.k = 0

        jitters = np.arange(-20.0, -11.0)  # 9 values (models.py:186)
        coords = np.arange(self.n)
        n_rest = self.n_restarts if self.optimizer == "nm" else 1
        # task order (coord, jitter, restart), coord-major like the
        # reference's itertools.product (models.py:190)
        grid = np.array(
            [(c, j) for c in coords for j in jitters for _ in range(n_rest)]
        )
        self._coord_idx = jnp.asarray(grid[:, 0].astype(np.int32))
        self._jitter_vals = jnp.asarray(grid[:, 1])
        self.B = int(grid.shape[0])

    # --- model protocol ---

    def m_for(self, k):
        if isinstance(self.nn, str) and self.nn == "adaptive":
            return max(10, int(k) + 2)  # reference models.py:172-175
        return int(self.nn)

    def fit(self, ds, k):
        # lazy, like the reference (models.py:157-159): data lives in ds
        self.k = int(k)
        return None

    def reset_rng(self):
        self.rng = np.random.default_rng(self.seed)

    def record_interval_time(self, i, seconds):
        """Called by the host sweep per interval (models.py:223-224)."""
        self.tot_train_t += seconds
        self.train_count += 1
        if self.calc_detail_avg and self.k < self.N and i < self.N:
            self.detail_avg[self.k, i] = seconds

    def get_times(self):
        out = super().get_times()
        if self.train_count:
            # host sweep (sweep_mode='host'): per-interval walls measured
            # directly (reference models.py:119-143)
            out.update(
                serial_train_time=self.tot_train_t,
                avg_serial_train_time=self.tot_train_t / self.train_count,
                calc_detail_avg=(
                    self.detail_avg[: self.k + 1]
                    if self.calc_detail_avg else None
                ),
            )
        else:
            # fused scan sweep: per-interval wall time is not attributable
            # inside one XLA program — estimate from the aggregate model
            # share of each sweep divided by that iteration's active
            # interval count (recorded by the driver), instead of silently
            # reporting zeros
            n_act = self.active_counts[: self.k + 1]
            tot_act = float(n_act.sum())
            out.update(
                serial_train_time=self.pred_time,
                avg_serial_train_time=(
                    self.pred_time / tot_act if tot_act else 0.0
                ),
                calc_detail_avg=None,
                timing_detail_note=(
                    "fused scan sweep: serial_train_time/avg_serial_train_"
                    "time are estimates (aggregate sweep model time / "
                    "active-interval counts); per-(k,i) detail requires "
                    "sweep_mode='host'"
                ),
            )
        return out

    def static_signature(self, k):
        if self.strategy == "nn":
            return ("m", self.m_for(k))
        # strategy penalties depend on the current iteration index
        return ("m", self.m_for(k), "k", int(k), self.strategy)

    def sweep_aux(self, k, N, cap=None):
        """Random NM starts theta0 ~ integers[-8, 0) per (interval, task),
        matching the reference's per-task draws (models.py:192). Grid mode
        is deterministic. 'col+rnd' additionally draws random selection
        scores over dataset rows (nnGPara_with_time.py:63-66)."""
        aux = {}
        if self.optimizer != "grid":
            aux["theta0"] = jnp.asarray(
                self.rng.integers(-8, 0, size=(N, self.B, 2)).astype(float)
            )
        if self.strategy == "col+rnd":
            if cap is None:
                raise ValueError("col+rnd needs the dataset capacity")
            aux["rand"] = jnp.asarray(self.rng2.random((N, cap)))
        return aux if aux else None

    def _select_neighbors(self, ds, q, m, i, aux_i):
        """Neighbour indices + selection mask under the active strategy.

        Penalty formulation: every dataset row (kk*N + ii) gets a score;
        the m smallest win. Invalid rows score +inf. Matches the traversal
        orders of reference nnGPara_with_time.py:50-170.
        """
        if self.strategy == "nn":
            idx, sqd_sel = nearest_neighbors(q, ds.X, ds.valid, m)
            return idx, jnp.isfinite(sqd_sel).astype(ds.valid.dtype)

        cap = ds.capacity
        N, k = self.N, self.k
        row = jnp.arange(cap)
        kk = row // N
        ii = row % N
        inf = jnp.inf
        colrank = jnp.where(ii > i, 2 * (ii - i) - 1, 2 * (i - ii))

        if self.strategy == "col_only":
            pen = jnp.where(ii == i, (k - kk).astype(float), inf)
        elif self.strategy == "col+rnd":
            on_col = min(m, k + 1)
            in_col = (ii == i) & (kk >= k + 1 - on_col)
            pen = jnp.where(in_col, -1.0 - kk, aux_i["rand"])
        elif self.strategy == "row_col":
            dist = jnp.abs(kk - k) + jnp.abs(ii - i)
            # tie-break in the reference's flat (interval-major) order
            pen = (dist * N * (k + 3) + ii * (k + 2) + kk).astype(float)
        elif self.strategy == "row":
            pen = ((k - kk) * (2 * N + 2) + colrank).astype(float)
        elif self.strategy == "col_full":
            pen = (colrank * (k + 2) + (k - kk)).astype(float)
        else:
            raise ValueError(f"Unknown neighbour strategy {self.strategy!r}")

        pen = jnp.where(ds.valid > 0, pen, inf)
        neg, idx = jax.lax.top_k(-pen, m)
        return idx, jnp.isfinite(neg).astype(ds.valid.dtype)

    def _optimize_thetas(self, sqd_xx, ym, mask, aux_i, jitter_shift=0.0):
        """Per-task theta selection; returns (thetas (B,2), fvals (B,))."""
        coord_idx, jitter_vals = self._coord_idx, self._jitter_vals

        if self.optimizer == "grid":
            return self._grid_shared(sqd_xx, ym, mask, jitter_shift)

        y_tasks = ym[:, self._coord_idx]  # (m, B) one target column per task

        def obj(thetas):  # (B, C, 2) -> (B, C), lane-major NLL
            Bc, C, _ = thetas.shape
            th_flat = thetas.reshape(-1, 2)
            jit_flat = jnp.repeat(jitter_vals, C)
            y_flat = jnp.repeat(y_tasks, C, axis=1)  # (m, B*C)
            fv = gplanes.nll_lanes(
                sqd_xx, y_flat[:, None, :], th_flat, jit_flat, mask,
                dtype=self.score_dtype,
            )  # (1, B*C)
            return fv[0].reshape(Bc, C)

        # fixed-iteration NM: identical lockstep algorithm, but a
        # fori_loop with converged-simplex freezing instead of a
        # while_loop — safe to nest inside the TPU sweep scan (the
        # while-in-scan miscompile is why NM mode previously needed the
        # host sweep); extra iterations on converged simplexes are no-ops
        th, fv = nelder_mead_fixed(
            obj, aux_i, iters=self.nm_max_iters,
            fatol=self.fatol, xatol=self.xatol,
        )
        return th, fv

    def _grid_shared(self, sqd_xx, ym, mask, jitter_shift=0.0):
        """Dense (theta x jitter) grid search with factorization sharing.

        The Gram matrix depends only on (theta, jitter), not on the target
        coordinate — so each of the 64x9 combos is factorized ONCE and a
        single multi-RHS forward substitution scores ALL n coordinates
        (the reference instead runs one scipy NM per coordinate x jitter,
        models.py:185-226). Returns per-task (thetas (B,2), fvals (B,)) in
        the same coord-major layout as the NM path. ``grid_refine`` rounds
        of 3x3 halving refinement run per-coordinate with the selected
        jitter held fixed.
        """
        n = self.n
        # base grid: sigma_y on the reference's theta0 support [-8, 0)
        # (models.py:192; targets are globally rescaled first), sigma_x
        # extended DOWNWARD to [-14, 0) — the interpolation basin for
        # near-duplicate neighbours (squared distances ~1e-14 between
        # near-converged same-slice states) that the reference's
        # multi-start Nelder-Mead reaches by walking below its -8 starts.
        # The upward side (sigma_x >= 0, NLL-overfit corners the NM never
        # visits) stays excluded. A local WALK + halving refinement then
        # polishes the winner, like the NM trajectory would.
        gx_vals = jnp.arange(-8.0, 0.0)
        gy_vals = jnp.arange(-8.0, 0.0)
        gx, gy = jnp.meshgrid(gx_vals, gy_vals)
        grid0 = jnp.stack([gx.ravel(), gy.ravel()], axis=1)  # (64, 2)
        # shift keeps the ABSOLUTE jitter equal to the reference's grid
        # when the targets are rescaled (see predict_fn)
        jit9 = jnp.asarray(np.arange(-20.0, -11.0)) + jitter_shift
        combo_th = jnp.repeat(grid0, 9, axis=0)  # (576, 2)
        combo_jit = jnp.tile(jit9, grid0.shape[0])  # (576,)

        # all coordinates scored against all combos with the combo batch in
        # the lane axis; each combo factorized once (shared across coords)
        fv_all = gplanes.nll_lanes(
            sqd_xx, ym, combo_th, combo_jit, mask, dtype=self.score_dtype
        )  # (n, G*9)
        G = grid0.shape[0]

        if self.grid_polish > 0:
            # scipy-NM-equivalent deterministic hyperopt: per (coord x
            # jitter), start a FIXED-ITERATION batched Nelder-Mead from
            # that jitter's best grid point and argmin the polished NLLs
            # over jitters — the reference's argmin-over-optimized-tasks
            # (models.py:185-226) with the random integer starts replaced
            # by the 64-point grid scan (deterministic, and a strictly
            # better start). fori_loop NM nests safely inside the TPU
            # sweep scan, unlike the while_loop NM mode.
            n_, nj = self.n, 9
            fv_gj = fv_all.reshape(n_, G, nj)
            b0 = jnp.argmin(fv_gj, axis=1)  # (n, 9) best grid idx per jitter
            th0 = grid0[b0.reshape(-1)]  # (n*9, 2) coord-major
            jit_t = jnp.tile(jit9, (n_,))  # (n*9,)
            y_cols = jnp.repeat(jnp.arange(n_), nj)

            def obj(thetas):  # (B, C, 2) -> (B, C)
                Bc, C, _ = thetas.shape
                th_flat = thetas.reshape(-1, 2)
                jit_flat = jnp.repeat(jit_t, C)
                y_flat = jnp.repeat(ym[:, y_cols], C, axis=1)  # (m, B*C)
                fv = gplanes.nll_lanes(
                    sqd_xx, y_flat[:, None, :], th_flat, jit_flat, mask,
                    dtype=self.score_dtype,
                )
                return fv[0].reshape(Bc, C)

            th_pol, fv_pol = nelder_mead_fixed(
                obj, th0, iters=self.grid_polish,
                fatol=self.fatol, xatol=self.xatol,
            )
            fv_pol = fv_pol.reshape(n_, nj)
            th_pol = th_pol.reshape(n_, nj, 2)
            bj = jnp.argmin(fv_pol, axis=1)  # (n,)
            th_best = jnp.take_along_axis(th_pol, bj[:, None, None], 1)[:, 0]
            jit_best = jit9[bj]
            fv_best = jnp.take_along_axis(fv_pol, bj[:, None], 1)[:, 0]
            per = self.B // self.n
            jit_tasks = self._jitter_vals.reshape(self.n, per) + jitter_shift
            fv_tasks = jnp.where(
                jit_tasks == jit_best[:, None], fv_best[:, None], jnp.inf
            )
            th_tasks = jnp.broadcast_to(th_best[:, None, :], (self.n, per, 2))
            return th_tasks.reshape(-1, 2), fv_tasks.reshape(-1)
        if self.selector == "loo":
            # LOO-gated basin choice: take the top-S NLL candidates per
            # coordinate, keep those within loo_window nats of the best,
            # and pick the smallest leave-one-out squared residual
            S = min(self.loo_top, fv_all.shape[1])
            negv, topidx = jax.lax.top_k(-fv_all, S)  # (n, S), fv ascending
            fv_cand = -negv
            th_cand = combo_th[topidx]  # (n, S, 2)
            jit_cand = combo_jit[topidx]  # (n, S)
            y_rep = jnp.repeat(ym, S, axis=1)  # (m, n*S) coord-major
            loo = gplanes.loo_lanes(
                sqd_xx, y_rep[:, None, :], th_cand.reshape(-1, 2),
                jit_cand.reshape(-1), mask, dtype=self.score_dtype,
            )[0].reshape(n, S)
            gate_ok = fv_cand <= fv_cand[:, :1] + self.loo_window
            loo_gated = jnp.where(gate_ok, loo, jnp.inf)
            bsel = jnp.argmin(loo_gated, axis=1)  # (n,)
            th_best = jnp.take_along_axis(
                th_cand, bsel[:, None, None], axis=1
            )[:, 0]
            jit_best = jnp.take_along_axis(jit_cand, bsel[:, None], 1)[:, 0]
            fv_best = jnp.take_along_axis(fv_cand, bsel[:, None], 1)[:, 0]
        else:
            # joint argmin over all (theta, jitter) combos per coordinate
            best = jnp.argmin(fv_all, axis=1)  # (n,)
            th_best = combo_th[best]
            jit_best = combo_jit[best]
            fv_best = jnp.take_along_axis(fv_all, best[:, None], axis=1)[:, 0]

        def theta_round(th_best, jit_best, fv_best, step, gate):
            """3x3 theta neighbourhood, jitter locked; move if the gain
            beats ``gate`` (the reference's NM never chases sub-fatol
            gains, which on near-tied bimodal landscapes trade away
            predictive quality)."""
            offs = step * jnp.array([-1.0, 0.0, 1.0])  # step may be traced
            ox, oy = jnp.meshgrid(offs, offs)
            neigh = jnp.stack([ox.ravel(), oy.ravel()], axis=1)  # (9, 2)
            cands = (th_best[:, None, :] + neigh[None]).reshape(-1, 2)
            jit_c = jnp.repeat(jit_best, 9)
            y_c = jnp.repeat(ym, 9, axis=1)
            fv_r = gplanes.nll_lanes(
                sqd_xx, y_c[:, None, :], cands, jit_c, mask,
                dtype=self.score_dtype,
            )[0].reshape(n, 9)
            b = jnp.argmin(fv_r, axis=1)
            th_new = jnp.take_along_axis(
                cands.reshape(n, 9, 2), b[:, None, None], 1
            )[:, 0]
            fv_new = jnp.take_along_axis(fv_r, b[:, None], 1)[:, 0]
            improve = fv_new < fv_best - gate
            th_best = jnp.where(improve[:, None], th_new, th_best)
            fv_best = jnp.where(improve, fv_new, fv_best)
            return th_best, fv_best

        def jitter_rescan(th_best, jit_best, fv_best, gate):
            """Re-select the jitter with theta fixed — a theta reached by
            walking often prefers a different noise floor than the base
            grid's winner did (accepted only past ``gate``)."""
            cands = jnp.repeat(th_best, 9, axis=0)
            jit_c = jnp.tile(jit9, (n,))
            y_c = jnp.repeat(ym, 9, axis=1)
            fv_r = gplanes.nll_lanes(
                sqd_xx, y_c[:, None, :], cands, jit_c, mask,
                dtype=self.score_dtype,
            )[0].reshape(n, 9)
            b = jnp.argmin(fv_r, axis=1)
            jit_new = jit9[b]
            fv_new = jnp.take_along_axis(fv_r, b[:, None], 1)[:, 0]
            improve = fv_new < fv_best - gate
            jit_best = jnp.where(improve, jit_new, jit_best)
            fv_best = jnp.where(improve, fv_new, fv_best)
            return jit_best, fv_best

        # walk (integer steps toward the local optimum, possibly outside
        # the start box, like the reference's NM trajectories) then refine
        # (halving steps) — one lax.scan over the step schedule so the
        # round graph is compiled once, not per round
        sched_steps = [1.0] * self.grid_walk
        sched_gates = [self.fatol] * self.grid_walk
        s = 0.5
        for _ in range(self.grid_refine):
            sched_steps.append(s)
            sched_gates.append(0.0)
            s *= 0.5
        if sched_steps:
            def round_body(carry, sx):
                th, fv = carry
                step, gate = sx
                th, fv = theta_round(th, jit_best, fv, step, gate)
                return (th, fv), None

            (th_best, fv_best), _ = jax.lax.scan(
                round_body, (th_best, fv_best),
                (jnp.asarray(sched_steps), jnp.asarray(sched_gates)),
            )
        # final noise-floor re-selection + one polish round
        jit_best, fv_best = jitter_rescan(
            th_best, jit_best, fv_best, self.fatol
        )
        th_best, fv_best = theta_round(th_best, jit_best, fv_best, 0.5, 0.0)

        # expand back to coord-major per-task layout: put the winner in the
        # task slot whose jitter matches, +inf elsewhere, so the downstream
        # per-coordinate argmin/jitter selection is unchanged
        per = self.B // n
        jit_tasks = self._jitter_vals.reshape(n, per) + jitter_shift
        fv_tasks = jnp.where(
            jit_tasks == jit_best[:, None], fv_best[:, None], jnp.inf
        )
        th_tasks = jnp.broadcast_to(th_best[:, None, :], (n, per, 2))
        return th_tasks.reshape(-1, 2), fv_tasks.reshape(-1)

    def predict_fn(self, state, ds, q, uF_prev, uG_prev, aux_i, i):
        m = min(self.m_for(self.k), ds.capacity)
        idx, sel_mask = self._select_neighbors(ds, q, m, i, aux_i)
        xm = jnp.take(ds.X, idx, axis=0)  # (m, n)
        ym = jnp.take(ds.D, idx, axis=0)  # (m, n)
        mask = sel_mask * jnp.take(ds.valid, idx, axis=0)

        sqd_xx = gpops.pairwise_sq_dists(xm, xm)
        sqd_xq = gpops.sq_dists_to(q, xm)

        # --- input/target standardization (grid mode only) --------------
        # The grid explores (sigma_x, sigma_y) over the integer box
        # [-8, 0)^2 — the same support as the reference's NM starts
        # (models.py:192) — but the reference's Nelder-Mead wanders far
        # outside that box when the data demands it (Hopf's time-augmented
        # coordinate makes squared distances ~1e6; late-iteration defects
        # decay to ~1e-14 power). Standardizing re-centres the box:
        #   * distances are divided by their mean (sigma_x absorbs it);
        #   * targets are divided by ONE global rms scale, and the jitter
        #     exponents are shifted by -2 log10(scale) so the ABSOLUTE
        #     jitter grid 1e-20..1e-12 is preserved exactly — the jitter's
        #     role as a tuned noise floor relative to the kernel amplitude
        #     is what lets the GP stop interpolating noise-level defects.
        # Both are exact reparameterizations of the reference's candidate
        # family; using one global y-scale keeps the factorization shared
        # across coordinates. NM mode stays on raw inputs (strict parity).
        if self.optimizer == "grid":
            count = jnp.maximum(jnp.sum(mask), 1.0)
            power = jnp.sum((ym * mask[:, None]) ** 2, axis=0) / count  # (n,)
            glob = jnp.max(power)
            y_scale = jnp.where(glob > 0, jnp.sqrt(glob), 1.0)
            jitter_shift = -2.0 * jnp.log10(y_scale)
            ym_fit = ym / y_scale
        else:
            y_scale = 1.0
            jitter_shift = 0.0
            ym_fit = ym

        jitter_vals = self._jitter_vals
        theta0 = aux_i["theta0"] if isinstance(aux_i, dict) and "theta0" in aux_i else None
        thetas, fvals = self._optimize_thetas(
            sqd_xx, ym_fit, mask, theta0, jitter_shift
        )

        # per-coordinate global NLL argmin (reference models.py:207-215)
        per = self.B // self.n
        fv = fvals.reshape(self.n, per)
        th = thetas.reshape(self.n, per, 2)
        jv = jitter_vals.reshape(self.n, per)
        best = jnp.argmin(fv, axis=1)
        th_best = jnp.take_along_axis(th, best[:, None, None], axis=1)[:, 0, :]
        # NOTE the posterior deliberately fits with the UNSHIFTED jitter
        # exponent on the scaled targets: scoring ranks candidates at the
        # reference's absolute noise floor (shifted grid), while the actual
        # prediction interpolates harder (floor 10^shift smaller). Refitting
        # with the shifted value is the reference-parity choice but measures
        # WORSE end-to-end (Hopf-32 K=15 vs 12) — the near-converged defect
        # targets are smooth, so the tighter interpolant wins.
        jv_best = jnp.take_along_axis(jv, best[:, None], axis=1)[:, 0]

        # lane-major posterior: one factorization per coordinate, all in
        # the lane axis; fitted on the (possibly scaled) targets and
        # rescaled back (posterior mean is linear in y). NOTE clamping
        # near-singular pivots here (pivot_floor) makes the bad solves
        # finite GARBAGE that poisons the iterate (measured Hopf-32 K=24);
        # leaving them NaN lets the driver's finite-guard fall back to the
        # bare correction instead (K=12)
        if self.posterior == "lu":
            # reference-behavior posterior (np.linalg.solve): keeps the
            # near-singular boundary interpolants the search selects.
            # Ablation on the scipy oracle shows this solve is
            # load-bearing for the reference: its Hopf-32 K jumps from 9
            # to 32 when the predict solve is Cholesky instead. A
            # magnitude gate vs the neighbour defect scale rejects the
            # occasional garbage solve (falls back to the Cholesky
            # posterior, whose NaNs the driver maps to bare correction).
            p_lu = gplanes.posterior_mean_lu(
                sqd_xx, sqd_xq, ym_fit, th_best, jv_best, mask
            )
            p_chol = gplanes.posterior_mean_lanes(
                sqd_xx, sqd_xq, ym_fit, th_best, jv_best, mask
            )
            y_mag = jnp.max(jnp.abs(ym_fit) * mask[:, None], axis=0)  # (n,)
            sane = jnp.isfinite(p_lu) & (jnp.abs(p_lu) <= 10.0 * y_mag + 1e-30)
            preds = jnp.where(sane, p_lu, p_chol)
        else:
            preds = gplanes.posterior_mean_lanes(
                sqd_xx, sqd_xq, ym_fit, th_best, jv_best, mask
            )
        return preds * y_scale
