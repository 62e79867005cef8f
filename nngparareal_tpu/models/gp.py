"""GParareal: one full-dataset GP per state coordinate.

Reference models.py:273-473 (GPjax_p). Each parareal iteration re-trains n
single-output GPs (linear-scale SE kernel, models.py:303-307) on the whole
accumulated dataset by Nelder-Mead over the Cholesky NLL, warm-started
from the previous iteration's optimum, across a 9-point jitter grid
10^{-20..-12}; coordinates whose best NLL is +inf are rescued by
escalating random restarts theta ~ 10^U(-4,1) (models.py:358-384).

TPU-native redesign: the (coordinate x jitter) task pool becomes one
batched on-device Nelder-Mead; the per-iteration Cholesky factorisation is
computed once per coordinate after training and only alpha is kept, so
every interval prediction is a kernel row + dot (the reference memoises
(L, alpha) per theta at predict time instead, models.py:434-445). Memory
is bounded by evaluating the NLL coordinate-by-coordinate with lax.map
while vmapping across (jitter x simplex-candidate) within each coordinate.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from nngparareal_tpu.models.base import ModelBase
from nngparareal_tpu.ops import gp as gpops
from nngparareal_tpu.ops import gp_lanes
from nngparareal_tpu.ops.optim import nelder_mead_fixed


class GParareal(ModelBase):
    name = "GP"

    def __init__(
        self,
        n,
        N,
        theta=None,
        fatol=None,
        xatol=None,
        nm_max_iters=400,
        seed=45,
        score_dtype=None,
        optimizer="nm",
        grid_chunk=None,
        grid_task_chunk=None,
        grid_logs=None,
        score_lanes=False,
        mesh=None,
        alpha_res_tol=1e-6,
        fit_rows_cap=16384,
        score_rows_cap=4096,
        **kwargs,
    ):
        super().__init__(n, N, **kwargs)
        theta = np.array([1.0, 1.0]) if theta is None else np.asarray(theta, float)
        self.theta0 = theta
        # optional down-cast for the NLL *scoring* only (candidate
        # ranking inside Nelder-Mead): f32 Cholesky of the growing
        # (rows x rows) Gram runs native on the MXU while f64 is
        # software-emulated — the cubic cost that made the reference's
        # GParareal DNF at scale (BASELINE section 3). The final alpha
        # fit (the posterior actually used) stays f64 regardless.
        self.score_dtype = score_dtype
        self.thetas = np.tile(theta, (self.n, 1))  # warm starts per coord
        self.jitter_sel = np.full(self.n, np.nan)
        self.fatol = 1e-4 if fatol is None else float(fatol)
        self.xatol = 1e-4 if xatol is None else float(xatol)
        self.nm_max_iters = int(nm_max_iters)
        self.rng = np.random.default_rng(seed)
        self.hyp = np.ones((self.n, theta.shape[0], self.N))
        self.k = 0
        self.state = None
        self._jitters = np.arange(-20.0, -11.0)  # models.py:387
        self._fit_cache = {}
        # optimizer='grid': dense log10 theta-grid + one same-shape refine
        # pass — fully deterministic, seed-free, and NM-free. On the axon
        # TPU toolchain the second distinct batched-NM executable in a
        # process kernel-faults (round-3 bisect, scripts/dev/
        # gp_crash_probe.py fitseq); the grid program is the plain batched
        # Cholesky-NLL family that runs reliably at every capacity, and a
        # dense search is the TPU-native theta selection anyway (SURVEY
        # section 7 design stance).
        assert optimizer in ("nm", "grid"), optimizer
        self.optimizer = optimizer
        # 13x13 log-grid spanning the reference's restart support
        # 10^U(-4,1) (models.py:382) with half-decade steps incl. 10^0
        # = the reference's warm-start theta [1,1]
        self._grid_logs = (np.linspace(-4.5, 1.5, 13) if grid_logs is None
                           else np.asarray(grid_logs, float))
        self._refine_half_span = 0.45
        # explicit candidate-chunk override for the grid search (None =
        # size by the ~2GB live-Gram budget)
        self.grid_chunk = None if grid_chunk is None else int(grid_chunk)
        # explicit tasks-per-device-call override (None = the measured
        # 18 x 256^2 safe envelope; see fit_grid docstring)
        self.grid_task_chunk = (None if grid_task_chunk is None
                                else int(grid_task_chunk))
        # score_lanes=True routes the grid NLL scoring through the
        # blocked lane-major Cholesky (ops/gp_lanes.nll_lanes_big):
        # candidate batch in the VPU lane axis instead of one row-major
        # XLA cholesky per candidate. Default False, settled by the
        # on-chip crossover bench (scripts/gp_chol_bench.py, round 5):
        # at m=512 row-major scores 169 candidates in 51 ms while the
        # blocked lane path blows XLA compile time (>30 min) — lanes
        # stay the small-m nnGP fast path only (BENCHMARKS.md notes).
        self.score_lanes = bool(score_lanes)
        # posterior-solve validation (see _validate_alphas): residual
        # tolerance for accepting the final f64 alpha fit
        self.alpha_res_tol = float(alpha_res_tol)
        # training-window cap: fit on at most this many (newest valid)
        # dataset rows. Past the 16384 bucket a single Gram buffer
        # crosses the device's 2^32-byte allocation limit (32768^2 f32
        # = 4.3 GB; the f64 alphas Gram twice that) and the TPU compile
        # helper refuses the program — measured on Hopf N=512 at
        # iteration 32, (k+1)*N = 16896 rows (chipqueue.log 08:00).
        # The reference's full-data GP (models.py:386-421) never saw a
        # fit this large in its published runs (Hopf-512 K=19 -> max
        # 10240 rows); the cap only engages in the beyond-reference
        # regime and keeps the newest rows, which carry the frontier.
        self.fit_rows_cap = None if fit_rows_cap is None else int(fit_rows_cap)
        # scoring-window cap (grid mode only): theta selection runs its
        # dense NLL grid on the newest score_rows_cap valid rows while the
        # f64 posterior (alphas + _validate_alphas residual walk) keeps the
        # full fit window. Two reasons, both measured on Hopf N=512:
        # (1) cost — the precision-explicit blocked f32 Cholesky
        # (ops/chol_blocked.py) scores ~1 s per candidate at m=16384;
        # 2 passes x 169 candidates x n coords = tens of minutes per
        # iteration, vs seconds at m=4096 (cubic in m);
        # (2) the 16384^2 blocked-chol executable repeatedly took down the
        # axon TPU worker right after the iter-32 OOM kernel faults
        # (chipqueue.log 08:40-09:00) — the 4096 size class is the proven
        # envelope. A theta picked on the newest-4096 window can differ
        # from the full-window winner on flat NLL landscapes, but the
        # posterior it parameterises is fit AND residual-validated on the
        # full window (tests/test_chol_blocked.py holdout-quality test);
        # _validate_alphas walks candidates if the choice is unusable.
        self.score_rows_cap = (None if score_rows_cap is None
                               else int(score_rows_cap))
        self.alpha_rejects = []  # (k, coord, rel, to) audit trail
        # fits whose posterior stayed unusable after the full walk —
        # surfaced in get_times() so queue guards key on data, not logs
        self.alpha_unusable = []
        # mesh: shard the grid hyperopt's (coord x jitter) task pool over
        # a device mesh — the TPU-native answer to the reference training
        # its full-GP tasks over the MPI worker pool (models.py:386-421,
        # the O(k^3 N^3) cost that made its GParareal DNF at scale). Each
        # device scores grid_task_chunk tasks per call; results gather
        # implicitly. The fine fan-out's mesh is threaded here by
        # Parareal.run(mesh=...).
        self.mesh = mesh if (mesh is not None
                             and getattr(mesh, "devices", np.empty(0)).size > 1
                             ) else None

    # --- jitted helpers, cached per dataset capacity ---

    def _get_fns(self, cap):
        if cap in self._fit_cache:
            return self._fit_cache[cap]
        n = self.n
        nj = len(self._jitters)
        jitters = jnp.asarray(self._jitters)

        score_dt = self.score_dtype
        # f32 scoring: relative jitter floor (x Gershgorin lambda_max
        # bound) + precision-explicit blocked Cholesky — see
        # ops/gp.gp_nll and ops/chol_blocked.py. Without the floor the
        # reference's absolute 10^{-20..-12} jitters are below f32
        # resolution and candidate survival is decided by where the
        # factorization fails, which on TPU (bf16-internal native
        # cholesky) selects degenerate near-diagonal thetas (the Hopf
        # N=512 crawl root cause, NOTES_ROUND5.md).
        rel_floor = (4.0 * float(np.finfo(np.float32).eps)
                     if score_dt == jnp.float32 else None)

        def make_obj(X, D, valid):
            sqd_xx = gpops.pairwise_sq_dists(X, X)
            if score_dt is not None:
                sqd_sc = sqd_xx.astype(score_dt)
                D_sc = D.astype(score_dt)
                valid_sc = valid.astype(score_dt)
            else:
                sqd_sc, D_sc, valid_sc = sqd_xx, D, valid

            def obj(thetas):  # (B, C, 2) -> (B, C); B = n_tasks_coord * nj
                shp = thetas.shape
                if score_dt is not None:
                    thetas = thetas.astype(score_dt)
                per_coord = thetas.reshape(-1, nj, shp[1], 2)
                jit_sc = jitters.astype(thetas.dtype)

                def coord_fn(args):
                    th_c, y = args  # (nj, C, 2), (CAP,)
                    def one(th, jit_pow):  # th (C, 2)
                        return jax.vmap(
                            lambda t: gpops.nll_from_sqd(
                                sqd_sc, y, t, jit_pow, valid_sc,
                                gpops.k_se_linear, rel_floor=rel_floor
                            )
                        )(th)
                    return jax.vmap(one)(th_c, jit_sc)  # (nj, C)

                # coord-major layout: per_coord rows are the n coordinates
                out = lax.map(coord_fn, (per_coord, D_sc.T))  # (n, nj, C)
                # rank in f64: +inf guards survive the cast
                return out.reshape(shp[0], shp[1]).astype(jnp.float64)

            return obj

        def fit_warm(X, D, valid, x0):
            # x0: (n*nj, 2) warm starts, coord-major. Fixed-iteration NM:
            # the while_loop variant segfaults the axon PJRT client on
            # this toolchain (host-side libgcc crash during the gpjax
            # fit, round 3) and converged simplexes freeze anyway
            obj = make_obj(X, D, valid)
            th, fv = nelder_mead_fixed(
                obj, x0, iters=self.nm_max_iters,
                fatol=self.fatol, xatol=self.xatol,
            )
            fv = fv.reshape(n, nj)
            th = th.reshape(n, nj, 2)
            best = jnp.argmin(fv, axis=1)
            th_best = jnp.take_along_axis(th, best[:, None, None], 1)[:, 0, :]
            jv_best = jitters[best]
            fv_best = jnp.take_along_axis(fv, best[:, None], 1)[:, 0]
            return th_best, jv_best, fv_best

        def alphas(X, D, valid, th, jv):
            sqd_xx = gpops.pairwise_sq_dists(X, X)

            def coord_fn(args):
                th_j, jv_j, y = args
                K = gpops.k_se_linear(sqd_xx, th_j)
                _, alpha = gpops.gp_fit(K, y, jv_j, valid)
                return alpha

            return lax.map(coord_fn, (th, jv, D.T))  # (n, CAP)

        def alpha_resid(X, D, valid, th, jv, alpha):
            """Relative residual ||(K+jI) a - y|| / ||y|| per coordinate.

            A backward-stable Cholesky solve keeps this at O(m * eps)
            even for ill-conditioned Grams, so it cleanly separates a
            usable posterior from a failed factorisation (NaN alpha, or
            finite garbage from a near-zero pivot)."""
            sqd_xx = gpops.pairwise_sq_dists(X, X)

            def coord_fn(args):
                th_j, jv_j, y, a = args
                K = gpops.k_se_linear(sqd_xx, th_j)
                Kj = gpops._masked_gram(K, valid, jv_j)
                ym = y * valid
                r = Kj @ a - ym
                return jnp.sqrt(jnp.sum(r * r)) / jnp.maximum(
                    jnp.sqrt(jnp.sum(ym * ym)), 1e-300)

            return lax.map(coord_fn, (th, jv, D.T, alpha))  # (n,)

        def fit_grid(X, Ycols, valid, grids, jp):
            """Dense theta search over one SLICE of the task pool:
            Ycols (Tc, CAP) per-task targets, grids (Tc, G, 2)
            linear-scale candidates, jp (Tc,) per-task log10 jitters.
            Memory is bounded twice: tasks are sequentialised with
            lax.map, and within a task the G candidates are evaluated in
            chunks sized so the live Gram batch stays under ~2 GB (peak
            chunk x cap^2 per step); the program is plain batched
            Cholesky NLLs — no Nelder-Mead loop. The T axis is sliced by
            the CALLER (_fit_grid_search) because single executables
            above ~18 tasks x 256^2 Gram kernel-fault the axon TPU
            worker (round-3 bisect, scripts/dev/gpgrid_fault_probe2.py:
            (27, 256^2) crashes, (18, 256^2) and (27, 128^2) pass)."""
            G = grids.shape[1]
            # no f32 chunk bonus: the blocked f32 factorization carries
            # an (M, M) L alongside the Gram (ops/chol_blocked.py), so
            # its live footprint matches the f64 path's
            chunk = max(1, min(G, int(2 ** 28 // max(cap * cap, 1))))
            if self.grid_chunk is not None:
                chunk = max(1, min(G, self.grid_chunk))
            n_chunks = -(-G // chunk)
            Gp = n_chunks * chunk

            sqd = gpops.pairwise_sq_dists(X, X)
            if score_dt is not None:
                sqd_s = sqd.astype(score_dt)
                Y = Ycols.astype(score_dt)
                v_s = valid.astype(score_dt)
                g_s = grids.astype(score_dt)
                jp_s = jp.astype(score_dt)
            else:
                sqd_s, Y, v_s, g_s, jp_s = sqd, Ycols, valid, grids, jp
            # pad candidates to a whole number of chunks (theta=1 dummies;
            # their NLLs are discarded by the fixed-G argmin below)
            pad = Gp - G
            if pad:
                g_s = jnp.concatenate(
                    [g_s, jnp.ones((g_s.shape[0], pad, 2), g_s.dtype)], 1
                )

            use_lanes = self.score_lanes

            def task_fn(args):
                g, y, j = args  # (Gp, 2), (CAP,), ()

                def chunk_fn(gc):  # (chunk, 2)
                    if use_lanes:
                        # research path (default off; no rel_floor wiring)
                        jb = jnp.broadcast_to(j, (gc.shape[0],))
                        return gp_lanes.nll_lanes_big(
                            sqd_s, y[:, None], gc, jb, v_s,
                            kernel=gp_lanes.k_se_linear_lanes,
                        )[0]
                    return jax.vmap(
                        lambda t: gpops.nll_from_sqd(
                            sqd_s, y, t, j, v_s, gpops.k_se_linear,
                            rel_floor=rel_floor
                        )
                    )(gc)

                out = lax.map(chunk_fn, g.reshape(n_chunks, chunk, 2))
                return out.reshape(Gp)[:G]

            f = lax.map(task_fn, (g_s, Y, jp_s))  # (Tc, G)
            f = jnp.where(jnp.isnan(f), jnp.inf, f).astype(jnp.float64)
            i = jnp.argmin(f, axis=1)
            th = jnp.take_along_axis(grids, i[:, None, None], 1)[:, 0, :]
            fb = jnp.take_along_axis(f, i[:, None], 1)[:, 0]
            return th, fb

        if self.mesh is not None:
            # shard the task axis over the mesh: each device scores its
            # block of (coord x jitter) tasks against the replicated
            # dataset; no collectives (the caller concatenates on host)
            from jax.sharding import PartitionSpec as P

            from nngparareal_tpu.parallel.mesh import shard_map

            ax = self.mesh.axis_names[0]
            fit_grid_exec = jax.jit(shard_map(
                fit_grid, self.mesh,
                in_specs=(P(), P(ax), P(), P(ax), P(ax)),
                out_specs=(P(ax), P(ax)),
            ))
        else:
            fit_grid_exec = jax.jit(fit_grid)
        fns = (
            jax.jit(fit_warm),
            jax.jit(alphas),
            make_obj,
            fit_grid_exec,
            jax.jit(alpha_resid),
        )
        self._fit_cache[cap] = fns
        return fns

    # --- model protocol ---

    @staticmethod
    def _bucket(rows, cap):
        """Smallest power-of-two >= rows (capped): bounds jit retraces to
        O(log K) while the Cholesky cost tracks the true dataset size."""
        b = 1
        while b < rows:
            b *= 2
        return min(b, cap)

    def fit(self, ds, k):
        self.k = int(k)
        nj = len(self._jitters)
        # occupied rows are [0, (k+1)*N); train on the smallest bucket
        rows = min((k + 1) * self.N, ds.capacity)
        scatter_idx = None
        if self.fit_rows_cap is not None and rows > self.fit_rows_cap:
            # windowed fit: gather the newest valid rows into the capped
            # bucket (executables for which are already compiled/cached)
            vmask = np.asarray(ds.valid[:rows]) > 0
            idx = np.where(vmask)[0][-self.fit_rows_cap:]
            B = self._bucket(max(idx.size, 1), self.fit_rows_cap)
            sel = np.zeros(B, np.int64)  # dummy slots gather row 0, masked
            sel[: idx.size] = idx
            scatter_idx = jnp.asarray(sel)
            dsX = ds.X[scatter_idx]
            dsD = ds.D[scatter_idx]
            dsV = jnp.asarray((np.arange(B) < idx.size).astype(np.float64))
        else:
            B = self._bucket(rows, ds.capacity)
            dsX, dsD, dsV = ds.X[:B], ds.D[:B], ds.valid[:B]
        fit_warm, alphas, make_obj, fit_grid, alpha_resid = self._get_fns(B)

        cand = None
        if self.optimizer == "grid":
            sX, sD, sV, fit_grid_s = dsX, dsD, dsV, fit_grid
            if (self.score_rows_cap is not None
                    and B > self.score_rows_cap):
                # scoring window: newest valid rows only (see __init__
                # notes). The f64 posterior below still uses the full
                # (dsX, dsD, dsV) window and its cached executables.
                vm = np.asarray(dsV) > 0
                sidx = np.where(vm)[0][-self.score_rows_cap:]
                Bs = self._bucket(max(sidx.size, 1), self.score_rows_cap)
                sel = np.zeros(Bs, np.int64)
                sel[: sidx.size] = sidx
                sj = jnp.asarray(sel)
                sX, sD = dsX[sj], dsD[sj]
                sV = jnp.asarray(
                    (np.arange(Bs) < sidx.size).astype(np.float64))
                fit_grid_s = self._get_fns(Bs)[3]
            th, jv, fv, cand = self._fit_grid_search(fit_grid_s, sX, sD, sV)
            bad = np.where(~np.isfinite(fv))[0]
            if bad.size:
                # A coordinate with no finite NLL anywhere on the widened
                # grids falls back to the reference's random-restart rescue
                # (models.py:358-384) instead of aborting the run — the one
                # place grid mode consumes the RNG stream (documented in
                # PARITY.md; advisor round-3 gp.py:404). The rescue is a
                # batched-NM executable — the very thing grid mode exists
                # to keep off the axon chip (a second distinct batched-NM
                # executable kernel-faults the worker, see __init__
                # notes) — so on a non-CPU backend it runs pinned to the
                # CPU device.
                th, jv, fv = (np.array(th), np.array(jv), np.array(fv))
                if jax.default_backend() not in ("cpu",):
                    cpu0 = jax.devices("cpu")[0]
                    dsX_c, dsD_c, dsV_c = jax.device_put(
                        (dsX, dsD, dsV), cpu0)
                    with jax.default_device(cpu0):
                        th, jv, fv = self._rescue(
                            dsX_c, dsD_c, dsV_c, th, jv, fv, bad)
                else:
                    th, jv, fv = self._rescue(dsX, dsD, dsV, th, jv, fv,
                                              bad)
        else:
            x0 = np.repeat(self.thetas, nj, axis=0)  # (n*nj, 2) coord-major
            th, jv, fv = fit_warm(dsX, dsD, dsV, jnp.asarray(x0))
            # np.array (not asarray): jax exports read-only views and
            # _rescue writes into these per-coordinate
            th, jv, fv = np.array(th), np.array(jv), np.array(fv)

            bad = np.where(~np.isfinite(fv))[0]
            if bad.size:
                th, jv, fv = self._rescue(dsX, dsD, dsV, th, jv, fv, bad)

        alpha = alphas(dsX, dsD, dsV, jnp.asarray(th), jnp.asarray(jv))
        n_valid = int(np.asarray(dsV).sum())
        if n_valid:
            th, jv, fv, alpha = self._validate_alphas(
                alphas, alpha_resid, dsX, dsD, dsV,
                np.array(th), np.array(jv), np.asarray(fv, float), alpha,
                cand, n_valid=n_valid)
        else:
            # warmup/compile fit against an all-invalid dataset: the
            # residual check is vacuous (masked Gram is the identity,
            # y is all-zero), so validation is skipped — a healthy run
            # must never print the unusable-posterior warning for it
            th, jv, fv = np.array(th), np.array(jv), np.asarray(fv, float)
        self.thetas = th
        self.jitter_sel = jv
        self.fvals = fv  # per-coordinate winning NLLs (diagnostics/tests)
        self.hyp[..., min(k + 1, self.N - 1)] = th
        # zero-pad alpha back to capacity: padded k_star rows hit zeros
        alpha_full = jnp.zeros((self.n, ds.capacity))
        if scatter_idx is None:
            alpha_full = alpha_full.at[:, :B].set(alpha)
        else:
            # windowed fit: scatter-add back to the rows' true positions
            # (add: dummy slots alias row 0 but carry masked-zero alpha)
            alpha_full = alpha_full.at[:, scatter_idx].add(
                alpha * dsV[None, :])
        self.state = (
            jnp.asarray(th),
            jnp.asarray(jv),
            alpha_full,
        )
        return None

    def _fit_grid_search(self, fit_grid, dsX, dsD, dsV):
        """Deterministic dense theta search: one coarse 13x13 log-grid over
        the reference's restart support, then a same-shape refine grid
        centred on each task's winner (identical avals -> both passes run
        the SAME compiled executable). A coordinate whose every candidate
        is non-finite gets progressively widened refine passes first; if
        those also fail it is returned with fv=+inf and fit() falls back
        to the NM random-restart rescue (models.py:358-384)."""
        n = self.n
        # f32 scoring collapses the jitter axis: with the relative floor
        # active (ops/gp.gp_nll rel_floor) every grid jitter 10^{-20..-12}
        # is below the floor, so the 9 per-jitter tasks would score
        # identically — one task per coordinate does the same search 9x
        # cheaper. jitter_sel seeds at the grid ceiling (-12); the f64
        # posterior fit's _validate_alphas escalation walks it up if the
        # IEEE solve needs more (phase 2), exactly as in the 9-task mode.
        score_f32 = self.score_dtype == jnp.float32
        jit_tasks = (np.array([-12.0]) if score_f32 else self._jitters)
        nj = len(jit_tasks)
        T = n * nj
        logs = self._grid_logs
        base = np.stack(
            np.meshgrid(logs, logs, indexing="ij"), -1
        ).reshape(-1, 2)  # (G, 2) log10
        G = base.shape[0]

        # per-call task budget: executables above ~18 tasks x 256^2 Gram
        # kernel-fault the axon worker (fit_grid docstring); slice the
        # task pool so each device call stays inside the proven envelope.
        cap = int(dsX.shape[0])
        tc = self.grid_task_chunk
        if tc is None:
            tc = max(1, min(T, (18 * 256 * 256) // max(cap * cap, 1)))
        # with a mesh, each device call carries one tc-block PER DEVICE
        # (the per-device executable stays inside the proven envelope)
        ndev = self.mesh.devices.size if self.mesh is not None else 1
        tc = tc * int(ndev)
        Tp = -(-T // tc) * tc
        Ycols = np.repeat(np.asarray(dsD).T, nj, axis=0)  # (T, CAP)
        jp_full = np.tile(jit_tasks, n)  # (T,)
        if Tp > T:  # dummy tasks: zero targets, mid jitter — discarded
            Ycols = np.concatenate(
                [Ycols, np.zeros((Tp - T, Ycols.shape[1]))], 0)
            jp_full = np.concatenate([jp_full, np.full(Tp - T, -12.0)])
        Yj = jnp.asarray(Ycols)
        jpj = jnp.asarray(jp_full)

        def run_grid(g_full):
            """fit_grid over the whole (T, G, 2) pool, tc tasks per
            device call (same shapes every call -> one executable)."""
            gp_ = np.concatenate(
                [g_full, np.ones((Tp - T, G, 2))], 0
            ) if Tp > T else g_full
            gj = jnp.asarray(gp_)
            th_parts, f_parts = [], []
            for s in range(0, Tp, tc):
                th_s, f_s = fit_grid(dsX, Yj[s:s + tc], dsV,
                                     gj[s:s + tc], jpj[s:s + tc])
                th_parts.append(np.array(th_s))
                f_parts.append(np.array(f_s))
            return (np.concatenate(th_parts)[:T],
                    np.concatenate(f_parts)[:T])

        g1 = np.broadcast_to(10.0 ** base, (T, G, 2))
        th1, f1 = run_grid(g1)

        hs = self._refine_half_span
        r = np.linspace(-hs, hs, len(logs))
        offs = np.stack(np.meshgrid(r, r, indexing="ij"), -1).reshape(-1, 2)
        # non-finite winners refine around the warm-start instead
        centre = np.where(
            np.isfinite(f1)[:, None], np.log10(np.maximum(th1, 1e-300)),
            0.0,
        )
        th, fv = th1, f1
        for widen in (1.0, 4.0, 16.0):
            g2 = 10.0 ** (centre[:, None, :] + widen * offs[None])
            th2, f2 = run_grid(g2)
            better = f2 < fv
            th = np.where(better[:, None], th2, th)
            fv = np.minimum(fv, f2)
            if np.all(np.isfinite(fv)):
                break
        # a coordinate with no finite NLL at any jitter survives to the
        # argmin below with fv=+inf; fit() routes it to the NM
        # random-restart rescue (reference models.py:358-384) rather than
        # aborting mid-solve (advisor round-3 gp.py:404)
        fv = fv.reshape(n, nj)
        th = th.reshape(n, nj, 2)
        best = np.argmin(fv, axis=1)
        th_best = np.take_along_axis(th, best[:, None, None], 1)[:, 0, :]
        jv_best = jit_tasks[best]
        fv_best = np.take_along_axis(fv, best[:, None], 1)[:, 0]
        # candidate table for posterior validation: the per-jitter grid
        # winners, ranked by NLL in _validate_alphas when the top pick's
        # f64 solve turns out unusable. In f32 single-jitter mode there
        # are no runner-up tasks (the theta winner is jitter-independent
        # under the floor) — validation relies on its phase-2 jitter
        # escalation instead.
        cand = None if score_f32 else (th, fv)
        return th_best, np.asarray(jv_best, float), fv_best, cand

    def _validate_alphas(self, alphas, alpha_resid, dsX, dsD, dsV,
                         th, jv, fv, alpha, cand=None, n_valid=None):
        """Reject posterior solves the corrector would silently discard.

        The NLL *scoring* (optionally down-cast, ``score_dtype``) and the
        final f64 alpha solve can disagree near singularity: a theta whose
        scored NLL is finite may produce a Gram that is numerically
        indefinite in (possibly emulated) f64 — ``jnp.linalg.cholesky``
        then yields NaN alphas, every prediction trips the driver's
        finite-guard (driver.py:348-354), and GParareal silently
        degenerates to bare Parareal (observed: the Hopf N=512 grid run
        crawled at +3 converged intervals/iter for 10 iterations, its
        11.8k-point Gram failing IEEE-f64 Cholesky at the selected
        theta while the f32 score had called it the best candidate).

        Guard: a backward-stable solve has relative residual O(m*eps)
        (~1e-10 at 49-bit, m=16k) regardless of conditioning, so
        ``alpha_res_tol`` separates usable posteriors from failed ones.
        Bad coordinates first walk down the grid's per-jitter candidate
        ranking (``cand``), then escalate jitter above the selection
        grid's ceiling — the deterministic equivalent of the reference's
        random-restart-until-finite rescue (models.py:358-384).
        """
        tol = self.alpha_res_tol
        jit_cap = -4.0
        nj = len(self._jitters)

        def bad_coords(a):
            rel = np.asarray(alpha_resid(dsX, dsD, dsV, jnp.asarray(th),
                                         jnp.asarray(jv), a))
            return np.where(~(rel < tol))[0], rel  # NaN counts as bad

        bad, rel = bad_coords(alpha)
        if not bad.size:
            return th, jv, fv, alpha

        # phase 1: next-best grid candidates by NLL (skip rank 0 = the
        # already-failed argmin pick)
        if cand is not None:
            th_nj, fv_nj = cand
            order = np.argsort(fv_nj, axis=1)
            for rank in range(1, nj):
                for c in bad:
                    j = order[c, rank]
                    if np.isfinite(fv_nj[c, j]):
                        self.alpha_rejects.append(dict(
                            k=self.k, coord=int(c), rel=float(rel[c]),
                            to=(float(self._jitters[j]),
                                th_nj[c, j].tolist())))
                        th[c] = th_nj[c, j]
                        jv[c] = self._jitters[j]
                        fv[c] = fv_nj[c, j]
                alpha = alphas(dsX, dsD, dsV, jnp.asarray(th),
                               jnp.asarray(jv))
                bad, rel = bad_coords(alpha)
                if not bad.size:
                    return th, jv, fv, alpha

        # phase 2: escalate jitter beyond the selection grid's ceiling —
        # per coordinate: a coord that hits the cap must not end the
        # escalation for coords still below it (round-4 advisor)
        while bad.size:
            esc = bad[jv[bad] < jit_cap]
            if not esc.size:
                break
            for c in esc:
                self.alpha_rejects.append(dict(
                    k=self.k, coord=int(c), rel=float(rel[c]),
                    to=(float(jv[c]) + 2.0, th[c].tolist())))
                jv[c] = jv[c] + 2.0
            alpha = alphas(dsX, dsD, dsV, jnp.asarray(th), jnp.asarray(jv))
            bad, rel = bad_coords(alpha)

        if bad.size:
            self.alpha_unusable.append(dict(
                k=self.k, coords=bad.tolist(),
                rel=[float(r) for r in rel[bad]], n_valid=n_valid))
            print(f"[gp] WARNING: k={self.k} posterior solve unusable on "
                  f"coords {bad.tolist()} (rel res {rel[bad].tolist()}, "
                  f"{n_valid} valid rows) after candidate walk + jitter "
                  f"escalation; the sweep's finite-guard will fall back "
                  f"to plain parareal there")
        return th, jv, fv, alpha

    def _rescue(self, dsX, dsD, dsV, th, jv, fv, bad, max_attempts=20):
        """Random-restart rescue for +inf coords (models.py:358-384).

        The reference retries a failing coordinate with fresh random draws
        until it finds a finite NLL (unbounded recursion,
        models.py:378-382); here each coordinate gets up to ``max_attempts``
        rounds of ``tot_rnd * nj`` batched restarts before raising.
        """
        nj = len(self._jitters)
        tot_rnd = max(3, int(self.N / 9))
        jitters = jnp.asarray(self._jitters)
        sqd_xx = gpops.pairwise_sq_dists(dsX, dsX)
        # score in the same dtype as the main fit (ranking only; the
        # winning theta is re-fit in f64 by alphas())
        if self.score_dtype is not None:
            sqd_xx = sqd_xx.astype(self.score_dtype)
            dsD = dsD.astype(self.score_dtype)
            dsV = dsV.astype(self.score_dtype)

        for j in bad:
            y = dsD[:, int(j)]
            jit_tasks = jnp.tile(jitters, tot_rnd)

            def obj(thetas, _y=y, _jt=jit_tasks):  # (B, C, 2) -> (B, C)
                if self.score_dtype is not None:
                    thetas = thetas.astype(self.score_dtype)
                    _jt = _jt.astype(self.score_dtype)

                def per_task(th_c, jit_pow):
                    return jax.vmap(
                        lambda t: gpops.nll_from_sqd(
                            sqd_xx, _y, t, jit_pow, dsV, gpops.k_se_linear
                        )
                    )(th_c)
                return jax.vmap(per_task)(thetas, _jt).astype(jnp.float64)

            for attempt in range(max_attempts):
                starts = 10.0 ** self.rng.uniform(-4, 1, (tot_rnd * nj, 2))
                th_r, fv_r = nelder_mead_fixed(
                    obj, jnp.asarray(starts), iters=self.nm_max_iters,
                    fatol=self.fatol, xatol=self.xatol,
                )
                fv_r = np.asarray(fv_r)
                best = int(np.argmin(fv_r))
                if np.isfinite(fv_r[best]):
                    th[int(j)] = np.asarray(th_r)[best]
                    jv[int(j)] = float(np.asarray(jit_tasks)[best])
                    fv[int(j)] = fv_r[best]
                    break
            else:
                raise RuntimeError(
                    f"GP random-restart rescue failed for coordinate {int(j)}: "
                    f"no finite NLL after {max_attempts} rounds"
                )
        return th, jv, fv

    def state_pytree(self):
        return self.state

    def predict_fn(self, state, ds, q, uF_prev, uG_prev, aux_i, i):
        th, jv, alpha = state
        sqd_q = gpops.sq_dists_to(q, ds.X)  # (CAP,)

        def post_mean(theta_j, alpha_j):
            k_star = gpops.k_se_linear(sqd_q, theta_j) * ds.valid
            return jnp.dot(k_star, alpha_j)

        return jax.vmap(post_mean)(th, alpha)

    # --- checkpoint ---

    def get_times(self):
        # counts (not the full audit dicts): queue guards key on these
        # instead of grepping logs for the unusable-posterior warning
        out = super().get_times()
        out.update(alpha_rejects=len(self.alpha_rejects),
                   alpha_unusable=len(self.alpha_unusable))
        return out

    def get_ckpt_state(self):
        out = super().get_ckpt_state()
        out.update(
            thetas=self.thetas,
            jitter_sel=self.jitter_sel,
            hyp=self.hyp,
            k=self.k,
            alpha_rejects=self.alpha_rejects,
            alpha_unusable=self.alpha_unusable,
        )
        return out

    def set_ckpt_state(self, state):
        super().set_ckpt_state(state)
        self.thetas = np.asarray(state["thetas"])
        self.jitter_sel = np.asarray(state["jitter_sel"])
        self.hyp = np.asarray(state["hyp"])
        self.k = int(state["k"])
        self.alpha_rejects = list(state.get("alpha_rejects", []))
        self.alpha_unusable = list(state.get("alpha_unusable", []))
