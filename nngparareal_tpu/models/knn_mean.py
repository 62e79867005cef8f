"""k-NN mean-of-neighbours comparison model (reference Figure_2.py:455-475).

Predicts the defect as the plain average of the m nearest dataset
defects — the baseline the paper's Figure 2 uses to show that a local GP
beats naive neighbour averaging.
"""

import jax.numpy as jnp

from nngparareal_tpu.models.base import ModelBase
from nngparareal_tpu.ops.nn_select import nearest_neighbors


class KNNMean(ModelBase):
    name = "kNN-mean"

    def __init__(self, n, N, nn=15, **kwargs):
        super().__init__(n, N, **kwargs)
        self.nn = nn
        self.k = 0

    def m_for(self, k):
        if isinstance(self.nn, str) and self.nn == "adaptive":
            return max(10, int(k) + 2)
        return int(self.nn)

    def fit(self, ds, k):
        self.k = int(k)
        return None

    def static_signature(self, k):
        return ("m", self.m_for(k))

    def predict_fn(self, state, ds, q, uF_prev, uG_prev, aux_i, i):
        m = min(self.m_for(self.k), ds.capacity)
        idx, sqd_sel = nearest_neighbors(q, ds.X, ds.valid, m)
        ym = jnp.take(ds.D, idx, axis=0)
        w = jnp.isfinite(sqd_sel).astype(ym.dtype)
        return jnp.sum(ym * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
