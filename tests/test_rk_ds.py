"""Double-single (f32x2) arithmetic and RK kernels vs the f64 oracle."""

import numpy as np
import jax.numpy as jnp

from nngparareal_tpu.ops import ds32, rk_ds
from nngparareal_tpu.ops import rk as rkops
from nngparareal_tpu.systems import Burgers


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=256), dtype=jnp.float32)
    b = jnp.asarray(rng.normal(size=256) * 1e-5, dtype=jnp.float32)
    s, e = ds32.two_sum(a, b)
    lhs = np.asarray(s, dtype=np.float64) + np.asarray(e, dtype=np.float64)
    rhs = np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64)
    np.testing.assert_array_equal(lhs, rhs)  # exact: s + e == a + b


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=256), dtype=jnp.float32)
    b = jnp.asarray(rng.normal(size=256), dtype=jnp.float32)
    p, e = ds32.two_prod(a, b)
    lhs = np.asarray(p, dtype=np.float64) + np.asarray(e, dtype=np.float64)
    rhs = np.asarray(a, dtype=np.float64) * np.asarray(b, dtype=np.float64)
    np.testing.assert_array_equal(lhs, rhs)  # Dekker: p + e == a * b


def test_ds_roundtrip_and_add():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=128))
    y = jnp.asarray(rng.normal(size=128) * 1e-9)
    xh, xl = ds32.ds_from_f64(x)
    yh, yl = ds32.ds_from_f64(y)
    # double-single carries ~49 mantissa bits: roundtrip is accurate to
    # ~2^-49 relative, not bit-exact f64
    np.testing.assert_allclose(ds32.ds_to_f64(xh, xl), x, rtol=4e-15)
    sh, sl = ds32.ds_add(xh, xl, yh, yl)
    np.testing.assert_allclose(ds32.ds_to_f64(sh, sl), x + y, rtol=3e-14)
    ph, pl = ds32.ds_mul(xh, xl, yh, yl)
    np.testing.assert_allclose(ds32.ds_to_f64(ph, pl), x * y, rtol=3e-13)


def test_burgers_ds_integration_matches_f64():
    """2000 RK8 steps of Burgers d=32: the ds32 path tracks the f64 kernel
    to ~1e-9 (per-step rounding ~6e-15 amplified by the front-steepening
    transient; at the production slice config — d=128, 4e4 steps,
    T_slice=0.046 — the measured end error is 3.3e-11, far below both
    published tolerances). Plain f32 drifts to >1e-6 on the same horizon."""
    ode = Burgers(d_x=32, normalization="-11")
    f64 = ode.get_vector_field()
    f_ds = rk_ds.make_burgers_ds_field(ode)
    u0 = jnp.asarray(ode.get_init_cond())
    t0, t1, steps = 0.0, 0.25, 800

    want = rkops.integrate_last(f64, "RK8", jnp.float64(t0),
                                jnp.float64((t1 - t0) / steps), steps, u0)

    fan = rk_ds.make_batched_last_integrator_ds(f_ds, "RK8", steps)
    got = fan(jnp.asarray([t0]), jnp.asarray([t1]), u0[None, :])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-9)

    # plain f32 on the same problem is orders of magnitude worse — the
    # compensation is doing real work. The f32 run is cheap, so it keeps
    # the longer 2000-step horizon where the drift is unambiguous.
    steps32 = 2000
    want32 = rkops.integrate_last(f64, "RK8", jnp.float64(t0),
                                  jnp.float64((t1 - t0) / steps32), steps32,
                                  u0)
    u32 = jnp.asarray(u0, dtype=jnp.float32)
    got32 = rkops.integrate_last(
        lambda t, u: f64(t, u.astype(jnp.float64)).astype(jnp.float32),
        "RK8", jnp.float32(t0), jnp.float32((t1 - t0) / steps32), steps32,
        u32)
    err32 = np.max(np.abs(np.asarray(got32, dtype=np.float64)
                          - np.asarray(want32)))
    assert err32 > 1e-6


def test_ds_packed_matches_transposed():
    """ds fan-out: lane-packed layout vs flat transposed layout. Fusion
    boundaries differ, so FMA contraction can shift results at the ds
    floor (~1e-12 rel measured on Hopf) — assert well under the ds-vs-f64
    deviation the solver already tolerates."""
    import numpy as np
    from nngparareal_tpu.systems.odes import Hopf
    from nngparareal_tpu.ops.ds_lift import ds_lift
    from nngparareal_tpu.ops.rk_ds import make_batched_last_integrator_ds

    ode = Hopf()
    f_ds = ds_lift(ode.get_vector_field())
    rng = np.random.default_rng(2)
    B = 160
    U = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)))
    t0s = jnp.linspace(0.0, 1.0, B)
    t1s = t0s + 0.01
    fan_t = make_batched_last_integrator_ds(f_ds, "RK8", 30, pack=False)
    fan_p = make_batched_last_integrator_ds(f_ds, "RK8", 30, pack=True)
    np.testing.assert_allclose(
        np.asarray(fan_p(t0s, t1s, U)),
        np.asarray(fan_t(t0s, t1s, U)),
        rtol=0, atol=1e-11,
    )
