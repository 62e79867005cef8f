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

    # --- jitted helpers, cached per dataset capacity ---

    def _get_fns(self, cap):
        if cap in self._fit_cache:
            return self._fit_cache[cap]
        n = self.n
        nj = len(self._jitters)
        jitters = jnp.asarray(self._jitters)

        score_dt = self.score_dtype

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
                                gpops.k_se_linear
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

        fns = (
            jax.jit(fit_warm),
            jax.jit(alphas),
            make_obj,
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
        B = self._bucket(rows, ds.capacity)
        dsX, dsD, dsV = ds.X[:B], ds.D[:B], ds.valid[:B]
        fit_warm, alphas, make_obj = self._get_fns(B)

        x0 = np.repeat(self.thetas, nj, axis=0)  # (n*nj, 2) coord-major
        th, jv, fv = fit_warm(dsX, dsD, dsV, jnp.asarray(x0))
        # np.array (not asarray): jax exports read-only views and _rescue
        # writes into these per-coordinate
        th, jv, fv = np.array(th), np.array(jv), np.array(fv)

        bad = np.where(~np.isfinite(fv))[0]
        if bad.size:
            th, jv, fv = self._rescue(dsX, dsD, dsV, th, jv, fv, bad)

        self.thetas = th
        self.jitter_sel = jv
        self.hyp[..., min(k + 1, self.N - 1)] = th
        alpha = alphas(dsX, dsD, dsV, jnp.asarray(th), jnp.asarray(jv))
        # zero-pad alpha back to capacity: padded k_star rows hit zeros
        alpha_full = jnp.zeros((self.n, ds.capacity))
        alpha_full = alpha_full.at[:, :B].set(alpha)
        self.state = (
            jnp.asarray(th),
            jnp.asarray(jv),
            alpha_full,
        )
        return None

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

    def get_ckpt_state(self):
        out = super().get_ckpt_state()
        out.update(
            thetas=self.thetas,
            jitter_sel=self.jitter_sel,
            hyp=self.hyp,
            k=self.k,
        )
        return out

    def set_ckpt_state(self, state):
        super().set_ckpt_state(state)
        self.thetas = np.asarray(state["thetas"])
        self.jitter_sel = np.asarray(state["jitter_sel"])
        self.hyp = np.asarray(state["hyp"])
        self.k = int(state["k"])
