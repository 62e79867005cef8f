"""min_rows sublane-fill padding (small-N degenerate-shape mitigation,
NOTES r3 item 4): padded rows must not change real slices' results."""

import jax.numpy as jnp
import numpy as np

from nngparareal_tpu.systems import Hopf


def _args(ode, B=12, steps=30):
    t0s = jnp.linspace(0.0, 0.12, B, endpoint=False)
    t1s = t0s + 0.01
    U = jnp.tile(jnp.asarray(ode.get_init_cond()), (B, 1)) \
        + jnp.linspace(0, 0.01, B)[:, None]
    return t0s, t1s, U


def test_f64_min_rows_bitwise():
    from nngparareal_tpu.ops.rk import make_batched_last_integrator

    ode = Hopf(normalization="-11")
    f = ode.get_vector_field()
    t0s, t1s, U = _args(ode)
    base = make_batched_last_integrator(f, "RK4", 30, pack=True)
    mr8 = make_batched_last_integrator(f, "RK4", 30, pack=True, min_rows=8)
    np.testing.assert_array_equal(np.asarray(base(t0s, t1s, U)),
                                  np.asarray(mr8(t0s, t1s, U)))


def test_ds_min_rows_bitwise():
    from nngparareal_tpu.ops.rk_ds import make_batched_last_integrator_ds

    ode = Hopf(normalization="-11")
    fds = ode.get_ds_vector_field()
    t0s, t1s, U = _args(ode)
    base = make_batched_last_integrator_ds(fds, "RK2", 30, pack=True)
    mr8 = make_batched_last_integrator_ds(fds, "RK2", 30, pack=True,
                                          min_rows=8)
    np.testing.assert_array_equal(np.asarray(base(t0s, t1s, U)),
                                  np.asarray(mr8(t0s, t1s, U)))
