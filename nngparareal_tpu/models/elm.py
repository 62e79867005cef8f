"""ELM corrector: random-feature extreme learning machine on an m-NN subset.

Reference models.py:476-554 (ELM_base/ELM): degree-2 polynomial features,
a fixed random projection (uniform +-1 bias and weights), relu/tanh/radbas
activation, and a ridge regression fit on the m nearest dataset rows per
query. The reference uses sklearn on the host; here the polynomial
expansion, activation and (centered) ridge solve are jnp ops fused into
the sweep, with the m-NN selection shared with nnGParareal.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nngparareal_tpu.models.base import ModelBase
from nngparareal_tpu.ops.nn_select import nearest_neighbors


def _poly2(x):
    """Degree-2 polynomial features of x (d,) -> (1 + d + d(d+1)/2,).

    Same feature set as sklearn PolynomialFeatures(degree=2); ordering is
    immaterial because a random projection follows.
    """
    d = x.shape[0]
    iu = jnp.triu_indices(d)
    quad = (x[:, None] * x[None, :])[iu]
    return jnp.concatenate([jnp.ones((1,), x.dtype), x, quad])


def n_poly2(d):
    return 1 + d + d * (d + 1) // 2


_LOSSES = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "tanh": jnp.tanh,
    "radbas": lambda x: jnp.exp(-(x ** 2)),
    # the reference registers radbas under a typo'd key (models.py:487)
    "radbad": lambda x: jnp.exp(-(x ** 2)),
}


class ELM(ModelBase):
    name = "ELM"

    def __init__(
        self,
        n,
        N,
        seed=47,
        res_size=20,
        loss="relu",
        M=1.0,
        R=1.0,
        alpha=0.0,
        degree=2,
        m=4,
        **kwargs,
    ):
        super().__init__(n, N, **kwargs)
        if degree != 2:
            raise NotImplementedError("only degree-2 polynomial features")
        self.m = int(m)
        self.res_size = int(res_size)
        self.loss = _LOSSES[loss]
        self.M, self.R, self.alpha = float(M), float(R), float(alpha)
        rng = np.random.default_rng(seed)
        P = n_poly2(n)
        self._bias = jnp.asarray(rng.uniform(-1, 1, (self.res_size, 1)))
        self._C = jnp.asarray(rng.uniform(-1, 1, (self.res_size, P)))
        self.k = 0

    def fit(self, ds, k):
        self.k = int(k)
        return None

    def static_signature(self, k):
        return ("m", self.m)

    def predict_fn(self, state, ds, q, uF_prev, uG_prev, aux_i, i):
        m = min(self.m, ds.capacity)
        idx, _ = nearest_neighbors(q, ds.X, ds.valid, m)
        xm = jnp.take(ds.X, idx, axis=0)  # (m, n)
        ym = jnp.take(ds.D, idx, axis=0)  # (m, n)
        w = jnp.take(ds.valid, idx, axis=0)  # (m,)

        bias = self._bias  # reference overwrites the M*R scaling (models.py:522-523)
        C = self.R * self._C

        feats = jax.vmap(_poly2)(xm)  # (m, P)
        H = self.loss(bias + C @ feats.T).T  # (m, res)
        h_new = self.loss(bias[:, 0] + C @ _poly2(q))  # (res,)

        # weighted centered ridge (sklearn Ridge fits an intercept)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        Hm = jnp.sum(H * w[:, None], axis=0) / wsum
        Ym = jnp.sum(ym * w[:, None], axis=0) / wsum
        Hc = (H - Hm) * w[:, None]
        Yc = (ym - Ym) * w[:, None]
        A = Hc.T @ Hc + (self.alpha + 1e-10) * jnp.eye(H.shape[1])
        beta = jnp.linalg.solve(A, Hc.T @ Yc)  # (res, n)
        return Ym + (h_new - Hm) @ beta
