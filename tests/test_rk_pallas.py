"""Whole-chunk Pallas RK fan-out (ops/rk_pallas.py), interpreter mode.

On CPU the Pallas interpreter must reproduce the vmap ds fan-out
bit-for-bit (they trace the same ds arithmetic); absolute accuracy vs
f64 is asserted on the TPU backend where compensated arithmetic compiles
exactly (ds32.backend_preserves_ds — see tests/test_ds_lift.py).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from nngparareal_tpu.systems import Lorenz, Hopf, Burgers
from nngparareal_tpu.ops.rk_pallas import make_pallas_fanout_ds
from nngparareal_tpu.ops.rk_ds import make_batched_last_integrator_ds


@pytest.mark.parametrize(
    "cls,kw,B,steps",
    [
        (Lorenz, {}, 16, 12),        # transposed (dim, B) layout
        (Hopf, {}, 16, 12),          # non-autonomous via time-as-state
        pytest.param(
            Burgers, {"d_x": 64}, 8, 4,  # (B, dim) layout, stencil field
            marks=pytest.mark.skipif(
                not os.environ.get("RUN_SLOW"),
                reason="pallas interpreter is ~2.5 min on the stencil "
                "field; RUN_SLOW only",
            ),
        ),
    ],
    ids=lambda v: getattr(v, "__name__", str(v))[:12],
)
def test_pallas_matches_vmap_ds(cls, kw, B, steps):
    ode = cls(normalization="-11", **kw)
    f_ds = ode.get_ds_vector_field()
    run_p = make_pallas_fanout_ds(f_ds, "RK8", steps, interpret=True)
    run_v = make_batched_last_integrator_ds(f_ds, "RK8", steps)
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.uniform(-0.5, 0.5, (B, ode.get_dim())))
    t0s = jnp.zeros(B)
    t1s = jnp.full(B, 0.05)
    got = np.asarray(run_p(t0s, t1s, U))
    want = np.asarray(run_v(t0s, t1s, U))
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-10)


def test_requires_fine_ds():
    from nngparareal_tpu.solver import RKSolver

    ode = Lorenz(normalization="-11")
    with pytest.raises(ValueError, match="fine_ds"):
        RKSolver(ode.get_vector_field(), 4, 64, fine_pallas=True)
