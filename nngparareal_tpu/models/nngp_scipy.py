"""nnGParareal with the reference's exact scipy Nelder-Mead hyperopt.

A host-side oracle re-implementation of reference models.py:98-260
(NNGP_p): per prediction point, select the m nearest dataset rows, then
for every (coordinate x jitter x restart) task run one scipy Nelder-Mead
NLL minimisation from a random integer start in [-8, 0)^2 drawn from one
sequential RNG stream (reference models.py:190-192), and predict with the
per-coordinate argmin candidate (the 0.9*min mask of models.py:212-215
provably reduces to the argmin: when min>0 the mask is empty and resets
to all, when min<0 the argmin row always satisfies fval < 0.9*min).

This model is NOT a TPU path — it is the CPU validation oracle the
K-parity of the batched optimizers is measured against (the model-side
analogue of SolverScipy). The driver runs it through the non-jitted
python sweep (``host_only``), so everything here is plain numpy/scipy.
"""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import minimize

from nngparareal_tpu.models.base import ModelBase


def _nll_np(d2, y, theta, jitter):
    """Negative log marginal likelihood, reference models.py:240-252."""
    m = y.shape[0]
    K = 10.0 ** theta[1] * np.exp(-0.5 * 10.0 ** (-theta[0]) * d2)
    K = K + np.eye(m) * 10.0 ** jitter
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


class NNGPScipy(ModelBase):
    """Reference-parity nnGParareal (scipy NM hyperopt, host execution)."""

    name = "NNGP_scipy"
    host_only = True

    def __init__(self, n, N, nn="adaptive", n_restarts=1, seed=45,
                 fatol=None, xatol=None, record=False, **kwargs):
        super().__init__(n, N, **kwargs)
        self.nn = nn
        self.n_restarts = int(n_restarts)
        self.seed = int(seed)
        self.rng = np.random.default_rng(self.seed)
        self.fatol = 1e-1 if fatol is None else float(fatol)
        self.xatol = 1e-1 if xatol is None else float(xatol)
        self.k = 0
        self._X = self._D = self._valid = None
        # optional diagnostics: {(k, i): [(fval, theta, jitter), ...coord]}
        self.record = bool(record)
        self.picks = {}

    def m_for(self, k):
        if isinstance(self.nn, str) and self.nn == "adaptive":
            return max(10, int(k) + 2)  # reference models.py:172-175
        return int(self.nn)

    def fit(self, ds, k):
        self.k = int(k)
        self._X = np.asarray(ds.X)
        self._D = np.asarray(ds.D)
        self._valid = np.asarray(ds.valid) > 0

    def reset_rng(self):
        self.rng = np.random.default_rng(self.seed)

    def static_signature(self, k):
        return ("m", self.m_for(k))

    def predict_fn(self, state, ds, q, uF_prev, uG_prev, aux_i, i):
        q = np.asarray(q)
        uF_prev = np.asarray(uF_prev)
        uG_prev = np.asarray(uG_prev)
        nvalid = int(self._valid.sum())
        if nvalid == 0:  # warmup / empty dataset: bare correction
            return jnp.asarray(uF_prev - uG_prev)

        m = min(self.m_for(self.k), nvalid)
        d2_all = ((self._X - q[None, :]) ** 2).sum(axis=1)
        d2_all[~self._valid] = np.inf
        # argsort of the cdist row like the reference (models.py:177-179).
        # NOTE: we use kind="stable" while numpy's default (the reference's
        # choice) is an unstable introsort, so tie-breaking between exactly
        # duplicate rows — common once slices converge — may order
        # differently; parity is therefore exact up to neighbor tie order.
        idx = np.argsort(d2_all, kind="stable")[:m]
        xm = self._X[idx]
        ym = self._D[idx]

        d2 = ((xm[:, None, :] - xm[None, :, :]) ** 2).sum(-1)
        d2q = ((xm - q[None, :]) ** 2).sum(-1)

        jitters = np.arange(-20.0, -11.0)
        # task order and RNG stream exactly as models.py:190-192:
        # ins = product(coords, jitters, restarts), one integer start each
        tasks = [
            (c, jit)
            for c in range(self.n)
            for jit in jitters
            for _ in range(self.n_restarts)
        ]
        starts = [self.rng.integers(-8, 0, 2) for _ in tasks]

        preds = np.empty(self.n)
        best = [(np.inf, None, None) for _ in range(self.n)]
        for (c, jit), th0 in zip(tasks, starts):
            y = ym[:, c]
            res = minimize(
                lambda th: _nll_np(d2, y, th, jit),
                th0.astype(float),
                method="Nelder-Mead",
                options={"fatol": self.fatol, "xatol": self.xatol},
            )
            if res.fun < best[c][0]:
                best[c] = (res.fun, res.x, jit)
        if self.record:
            self.picks[(self.k, int(i))] = [
                (float(b[0]), None if b[1] is None else np.array(b[1]),
                 b[2]) for b in best
            ]
        for c in range(self.n):
            fv, th, jit = best[c]
            if th is None or not np.isfinite(fv):
                # every task failed (all-inf NLL): bare correction
                preds[c] = uF_prev[c] - uG_prev[c]
                continue
            K = 10.0 ** th[1] * np.exp(-0.5 * 10.0 ** (-th[0]) * d2)
            K = K + np.eye(m) * 10.0 ** jit
            kq = 10.0 ** th[1] * np.exp(-0.5 * 10.0 ** (-th[0]) * d2q)
            preds[c] = kq @ np.linalg.solve(K, ym[:, c])
        return jnp.asarray(preds)
