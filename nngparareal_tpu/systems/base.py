"""Problem-definition base class.

Equivalent surface to the reference ``ODE`` (systems.py:23-77): a named
system with an optional [-1,1]^d normalisation wrapper, a default initial
condition and a (t, u) -> du/dt vector field. The vector field returned
here is a *pure jnp function* left unjitted — the RK kernels trace it into
their own fused programs (jitting it separately, as the reference does,
only adds call boundaries XLA cannot fuse across).
"""

import numpy as np

from nngparareal_tpu.utils.normalize import Normalize


class ODE:
    def __init__(self, name, mn, mx, u0, normalization=None):
        self.name = name
        self.normalizer = Normalize(mn, mx, normalization)
        self.u0 = np.asarray(self.normalizer.fit(np.asarray(u0, dtype=float)))

    # subclasses implement the raw (unnormalised) field in jnp ops
    def _f(self, t, u):
        raise NotImplementedError("abstract vector field")

    def get_vector_field(self):
        norm = self.normalizer
        raw = self._f
        if norm.is_identity:
            return raw
        # systems may provide an algebraically fused normalized field
        # (saves the affine unwrap/rescale ops in the RK hot loop)
        fused = getattr(self, "_f_norm11", None)
        if fused is not None and norm.norm_type == "-11":
            return fused
        scale = norm.get_scale()

        def f_normalized(t, u):
            return raw(t, norm.inverse(u)) * scale

        return f_normalized

    def get_ds_vector_field(self):
        """Double-single (f32x2) twin of the vector field for the
        compensated-arithmetic fine solver (``RKSolver(fine_ds=...)``).

        Auto-lifted from the f64 field via the jaxpr interpreter
        (ops/ds_lift.py) — subclasses with a hand-fused ds field (e.g.
        Burgers) override this. Accuracy across the zoo: ~1e-13 absolute
        vs the f64 field (tests/test_ds_lift.py)."""
        from nngparareal_tpu.ops.ds_lift import ds_lift

        return ds_lift(self.get_vector_field())

    def get_vector_field_numpy(self):
        """Host/numpy twin for scipy-based validation solvers."""
        f = self.get_vector_field()

        def f_np(t, u):
            return np.asarray(f(t, np.asarray(u)))

        return f_np

    def set_default_init_cond(self, u0):
        self.u0 = np.asarray(self.normalizer.fit(np.asarray(u0, dtype=float)))

    def get_init_cond(self, u0=None):
        if u0 is None:
            return np.array(self.u0, dtype=float)
        return np.asarray(self.normalizer.fit(np.asarray(u0, dtype=float)))

    def get_dim(self):
        return int(self.u0.shape[0])
