"""Classic Parareal correction: pred = F(u^k) - G(u^k).

Reference models.py:74-83 (BareParareal).
"""

from nngparareal_tpu.models.base import ModelBase


class BareParareal(ModelBase):
    name = "Parareal"
    needs_dataset = False

    def predict_fn(self, state, ds, q, uF_prev, uG_prev, aux_i, i):
        return uF_prev - uG_prev
