"""GParareal with the reference's exact scipy Nelder-Mead training.

Host-side oracle re-implementation of reference models.py:273-473
(GPjax_p): one full-dataset GP per state coordinate, linear-scale SE
kernel sigma_y^2 exp(-d^2 / (2 sigma_x^2)), trained once per iteration
by per-(coordinate x 9 jitters) scipy NM warm-started from the previous
optimum (models.py:341-347, 386-421), +inf coordinates rescued by
escalating random restarts theta ~ 10^U(-4,1) (models.py:358-384), and
the per-coordinate argmin selection (the 0.9*min mask provably reduces
to it). Prediction reuses a per-theta Cholesky memo across the
iteration's interval predictions (models.py:434-445).

This is the CPU validation oracle for the GP parity column — scipy's
per-task early stopping makes it ~an order of magnitude faster on one
CPU core than the lockstep batched NM in models/gp.py (whose design
targets TPU lanes), so the published-K checks actually complete.
"""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import minimize

from nngparareal_tpu.models.base import ModelBase


def _nll_gp(d2, y, theta, jitter):
    """Reference models.py:317-330 (LinAlgError -> +inf)."""
    m = y.shape[0]
    sx, sy = theta
    K = (sy * sy) * np.exp(-0.5 * d2 / (sx * sx)) + np.eye(m) * 10.0 ** jitter
    try:
        L = np.linalg.cholesky(K)
    except np.linalg.LinAlgError:
        return np.inf
    al = np.linalg.solve(L.T, np.linalg.solve(L, y))
    val = (
        0.5 * y @ al
        + np.log(np.diag(L)).sum()
        + 0.5 * m * np.log(2 * np.pi)
    )
    return np.inf if np.isnan(val) else val


class GPScipy(ModelBase):
    name = "GP_scipy"
    host_only = True

    def __init__(self, n, N, theta=None, fatol=None, xatol=None, seed=45,
                 **kwargs):
        super().__init__(n, N, **kwargs)
        theta = [1.0, 1.0] if theta is None else theta
        self.theta0 = np.asarray(theta, float)
        self.thetas = [self.theta0.copy() for _ in range(self.n)]
        self.jitter_sel = [None] * self.n
        self.fatol = 1e-4 if fatol is None else float(fatol)
        self.xatol = 1e-4 if xatol is None else float(xatol)
        self.rng = np.random.default_rng(int(seed))
        self.seed = int(seed)
        self.k = 0
        self._jitters = np.arange(-20.0, -11.0)
        self._X = self._D = None
        self._d2 = None
        self._mem = {}

    def reset_rng(self):
        self.rng = np.random.default_rng(self.seed)

    def _train_coord_rnd(self, d2, y, depth=0):
        """Random-restart rescue (models.py:358-384), bounded recursion."""
        tot_rnd = max(3, int(self.N / 9))
        best = (np.inf, None, None)
        for _ in range(tot_rnd):
            for jit in self._jitters:
                th0 = 10.0 ** self.rng.uniform(-4, 1, 2)
                res = minimize(
                    lambda th: _nll_gp(d2, y, th, jit), th0,
                    method="Nelder-Mead",
                    options={"fatol": self.fatol, "xatol": self.xatol},
                )
                if res.fun < best[0]:
                    best = (res.fun, res.x, jit)
        if not np.isfinite(best[0]):
            if depth >= 20:
                raise RuntimeError("GP random-restart rescue failed")
            return self._train_coord_rnd(d2, y, depth + 1)
        return best

    def fit(self, ds, k):
        self.k = int(k)
        self._mem = {}
        valid = np.asarray(ds.valid) > 0
        self._X = np.asarray(ds.X)[valid]
        self._D = np.asarray(ds.D)[valid]
        X = self._X
        d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        self._d2 = d2
        for c in range(self.n):
            y = self._D[:, c]
            best = (np.inf, None, None)
            for jit in self._jitters:
                res = minimize(
                    lambda th: _nll_gp(d2, y, th, jit), self.thetas[c],
                    method="Nelder-Mead",
                    options={"fatol": self.fatol, "xatol": self.xatol},
                )
                if res.fun < best[0]:
                    best = (res.fun, res.x, jit)
            if not np.isfinite(best[0]):
                best = self._train_coord_rnd(d2, y)
            _, th, jit = best
            self.thetas[c] = np.asarray(th, float)
            self.jitter_sel[c] = float(jit)

    def predict_fn(self, state, ds, q, uF_prev, uG_prev, aux_i, i):
        if self._X is None or self._X.shape[0] == 0:
            return jnp.asarray(np.asarray(uF_prev) - np.asarray(uG_prev))
        q = np.asarray(q)
        d2q = ((self._X - q[None, :]) ** 2).sum(-1)
        preds = np.empty(self.n)
        for c in range(self.n):
            sx, sy = self.thetas[c]
            jit = self.jitter_sel[c]
            key = (float(sx), float(sy), jit, c)
            if key not in self._mem:
                K = (sy * sy) * np.exp(-0.5 * self._d2 / (sx * sx))
                K = K + np.eye(K.shape[0]) * 10.0 ** jit
                L = np.linalg.cholesky(K)
                al = np.linalg.solve(L.T, np.linalg.solve(L, self._D[:, c]))
                self._mem[key] = al
            kq = (sy * sy) * np.exp(-0.5 * d2q / (sx * sx))
            preds[c] = kq @ self._mem[key]
        return jnp.asarray(preds)
