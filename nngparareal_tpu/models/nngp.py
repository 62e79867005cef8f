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
from nngparareal_tpu.ops.nn_select import nearest_neighbors
from nngparareal_tpu.ops.optim import nelder_mead


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

    def static_signature(self, k):
        return ("m", self.m_for(k))

    def sweep_aux(self, k, N):
        """Random NM starts theta0 ~ integers[-8, 0) per (interval, task),
        matching the reference's per-task draws (models.py:192). Grid mode
        is deterministic and needs no aux."""
        if self.optimizer == "grid":
            return None
        draws = self.rng.integers(-8, 0, size=(N, self.B, 2)).astype(float)
        return jnp.asarray(draws)

    def _optimize_thetas(self, sqd_xx, ym, mask, aux_i):
        """Per-task theta selection; returns (thetas (B,2), fvals (B,))."""
        coord_idx, jitter_vals = self._coord_idx, self._jitter_vals

        def task_nll_batch(theta_c, coord, jit_pow):
            y = jnp.take(ym, coord, axis=1)
            return jax.vmap(
                lambda th: gpops.nll_from_sqd(
                    sqd_xx, y, th, jit_pow, mask, gpops.k_se_log10
                )
            )(theta_c)

        if self.optimizer == "grid":
            g = jnp.arange(-8.0, 0.0)
            gx, gy = jnp.meshgrid(g, g)
            grid0 = jnp.stack([gx.ravel(), gy.ravel()], axis=1)  # (64, 2)

            def eval_grid(grids):  # (B, G, 2) -> best (B,2), (B,)
                fv = jax.vmap(task_nll_batch)(grids, coord_idx, jitter_vals)
                best = jnp.argmin(fv, axis=1)
                th = jnp.take_along_axis(grids, best[:, None, None], 1)[:, 0, :]
                f = jnp.take_along_axis(fv, best[:, None], 1)[:, 0]
                return th, f

            grids = jnp.broadcast_to(grid0[None], (self.B,) + grid0.shape)
            th, fv = eval_grid(grids)
            step = 0.5
            for _ in range(self.grid_refine):
                offs = jnp.array([-step, 0.0, step])
                ox, oy = jnp.meshgrid(offs, offs)
                neigh = jnp.stack([ox.ravel(), oy.ravel()], axis=1)  # (9, 2)
                th, fv = eval_grid(th[:, None, :] + neigh[None])
                step *= 0.5
            return th, fv

        def obj(thetas):  # (B, C, 2) -> (B, C)
            return jax.vmap(task_nll_batch)(thetas, coord_idx, jitter_vals)

        th, fv, _ = nelder_mead(
            obj, aux_i, max_iters=self.nm_max_iters,
            fatol=self.fatol, xatol=self.xatol,
        )
        return th, fv

    def predict_fn(self, state, ds, q, uF_prev, uG_prev, aux_i):
        m = min(self.m_for(self.k), ds.capacity)
        idx, sqd_sel = nearest_neighbors(q, ds.X, ds.valid, m)
        xm = jnp.take(ds.X, idx, axis=0)  # (m, n)
        ym = jnp.take(ds.D, idx, axis=0)  # (m, n)
        mask = jnp.take(ds.valid, idx, axis=0)  # (m,) handles count<m

        sqd_xx = gpops.pairwise_sq_dists(xm, xm)
        sqd_xq = gpops.sq_dists_to(q, xm)

        jitter_vals = self._jitter_vals
        thetas, fvals = self._optimize_thetas(sqd_xx, ym, mask, aux_i)

        # per-coordinate global NLL argmin (reference models.py:207-215)
        per = self.B // self.n
        fv = fvals.reshape(self.n, per)
        th = thetas.reshape(self.n, per, 2)
        jv = jitter_vals.reshape(self.n, per)
        best = jnp.argmin(fv, axis=1)
        th_best = jnp.take_along_axis(th, best[:, None, None], axis=1)[:, 0, :]
        jv_best = jnp.take_along_axis(jv, best[:, None], axis=1)[:, 0]

        def post_mean(theta_j, jit_j, j):
            y = jnp.take(ym, j, axis=1)
            return gpops.predict_mean_from_sqd(
                sqd_xx, sqd_xq, y, theta_j, jit_j, mask, gpops.k_se_log10
            )

        preds = jax.vmap(post_mean)(
            th_best, jv_best, jnp.arange(self.n, dtype=jnp.int32)
        )
        return preds
