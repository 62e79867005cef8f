"""RK kernels vs independent numpy oracle and scipy (SURVEY.md section 7 step 1)."""

import numpy as np
import pytest
import jax.numpy as jnp
import jax

from nngparareal_tpu.ops.rk import (
    integrate_last,
    integrate_traj,
    integrate_last_numpy,
    make_last_integrator,
    make_batched_last_integrator,
)
from nngparareal_tpu.ops.butcher import TABLEAUS


def f_linear(t, u):
    return -u


def f_lorenz(t, u):
    return jnp.stack(
        [
            10.0 * (u[1] - u[0]),
            28.0 * u[0] - u[1] - u[0] * u[2],
            u[0] * u[1] - (8.0 / 3.0) * u[2],
        ]
    )


@pytest.mark.parametrize("method", ["RK1", "RK2", "RK4", "RK8"])
def test_matches_numpy_oracle(method):
    u0 = jnp.array([1.0, 2.0, 3.0])
    got = integrate_last(f_lorenz, method, 0.0, 0.5 / 200, 200, u0)
    want = integrate_last_numpy(
        lambda t, u: np.asarray(f_lorenz(t, jnp.asarray(u))),
        method, 0.0, 0.5, 200, np.array([1.0, 2.0, 3.0]),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize(
    "method,order,steps", [("RK1", 1, (32, 64)), ("RK2", 2, (32, 64)),
                           ("RK4", 4, (8, 16)), ("RK8", 8, (2, 4))]
)
def test_convergence_order(method, order, steps):
    """Error on exp decay should shrink by ~2^order when halving dt."""
    u0 = jnp.array([1.0])
    T = 1.0
    exact = np.exp(-T)
    errs = []
    for s in steps:
        got = integrate_last(f_linear, method, 0.0, T / s, s, u0)
        errs.append(abs(float(got[0]) - exact))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.7, (method, errs, rate)


def test_against_scipy_high_accuracy():
    from scipy.integrate import solve_ivp

    u0 = np.array([1.0, 1.0, 1.0])
    T = 1.0
    got = integrate_last(f_lorenz, "RK8", 0.0, T / 20000, 20000, jnp.asarray(u0))
    ref = solve_ivp(
        lambda t, u: np.asarray(f_lorenz(t, jnp.asarray(u))),
        [0, T], u0, method="DOP853", rtol=1e-12, atol=1e-12,
    ).y[:, -1]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-9, atol=1e-9)


def test_traj_endpoint_matches_last():
    u0 = jnp.array([1.0, 2.0, 3.0])
    traj = integrate_traj(f_lorenz, "RK4", 0.0, 0.01, 100, u0)
    last = integrate_last(f_lorenz, "RK4", 0.0, 0.01, 100, u0)
    assert traj.shape == (101, 3)
    # scan vs fori_loop may fuse differently — near-bitwise in f64
    np.testing.assert_allclose(
        np.asarray(traj[-1]), np.asarray(last), rtol=1e-13, atol=1e-14
    )


def test_paged_equals_unpaged():
    u0 = jnp.array([1.0, 0.5])
    f = lambda t, u: jnp.stack([u[1], -u[0]])
    run_paged = make_last_integrator(f, "RK4", 1000, thresh=128)
    run_flat = make_last_integrator(f, "RK4", 1000, thresh=10**9)
    np.testing.assert_allclose(
        np.asarray(run_paged(0.0, 2.0, u0)),
        np.asarray(run_flat(0.0, 2.0, u0)),
        rtol=1e-13, atol=1e-14,
    )


def test_batched_matches_loop():
    u0s = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)))
    t0s = jnp.arange(7.0)
    t1s = t0s + 0.3
    fan = make_batched_last_integrator(f_lorenz, "RK4", 50)
    batched = np.asarray(fan(t0s, t1s, u0s))
    for i in range(7):
        single = integrate_last(
            f_lorenz, "RK4", t0s[i], 0.3 / 50, 50, u0s[i]
        )
        # vmapped vs single-program fusions are near- but not exactly
        # bitwise on all backends
        np.testing.assert_allclose(
            batched[i], np.asarray(single), rtol=1e-12, atol=1e-13
        )


def test_tableau_consistency():
    for name, tab in TABLEAUS.items():
        assert abs(sum(tab.b) - 1.0) < 1e-12, name
        for i, row in enumerate(tab.a):
            assert abs(sum(row) - tab.c[i]) < 1e-12, (name, i)


def test_packed_matches_transposed():
    """The lane-packed (dim, B/128, 128) small-d fan-out layout must agree
    with the flat transposed (dim, B) layout — same per-slice arithmetic,
    only the register tiling differs (f64 is bitwise on CPU; keep a tight
    tolerance so any real arithmetic change trips)."""
    rng = np.random.default_rng(1)
    for B in (300, 64):  # non-multiple of 128, and under one lane tile
        u0s = jnp.asarray(rng.normal(size=(B, 3)))
        t0s = jnp.linspace(0.0, 1.0, B)
        t1s = t0s + 0.05
        fan_t = make_batched_last_integrator(f_lorenz, "RK4", 40, pack=False)
        fan_p = make_batched_last_integrator(f_lorenz, "RK4", 40, pack=True)
        np.testing.assert_allclose(
            np.asarray(fan_p(t0s, t1s, u0s)),
            np.asarray(fan_t(t0s, t1s, u0s)),
            rtol=1e-13, atol=1e-14,
        )


def test_batched_paged_contract():
    """Paged batched fan-outs must expose the paged/warm contract the
    driver uses to keep one bounded device dispatch per page (jitting the
    page loop would fuse all pages into one executable)."""
    from nngparareal_tpu.systems import Lorenz
    from nngparareal_tpu.ops.rk import make_batched_last_integrator
    from nngparareal_tpu.ops.rk_ds import make_batched_last_integrator_ds
    from nngparareal_tpu.ops.ds_lift import ds_lift

    ode = Lorenz(normalization="-11")
    fv = ode.get_vector_field()
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 3)))
    t0s = jnp.zeros(4)
    t1s = jnp.full(4, 0.05)

    # 120 steps / thresh 48 keeps the multi-page structure (4*120/48 = 10
    # pages) at 2.5x less dispatch+compile than the original 300/128
    paged = make_batched_last_integrator(fv, "RK4", 120, thresh=48)
    flat = make_batched_last_integrator(fv, "RK4", 120, thresh=10**9)
    assert getattr(paged, "paged", False) and not getattr(flat, "paged", False)
    np.testing.assert_allclose(np.asarray(paged(t0s, t1s, U)),
                               np.asarray(flat(t0s, t1s, U)), rtol=1e-12)
    # warm runs one page of each distinct chunk size without error
    paged.warm(t0s, t1s, U)

    f_ds = ds_lift(fv)
    paged_ds = make_batched_last_integrator_ds(f_ds, "RK4", 120, thresh=48)
    flat_ds = make_batched_last_integrator_ds(f_ds, "RK4", 120, thresh=10**9)
    assert getattr(paged_ds, "paged", False)
    assert not getattr(flat_ds, "paged", False)
    np.testing.assert_allclose(np.asarray(paged_ds(t0s, t1s, U)),
                               np.asarray(flat_ds(t0s, t1s, U)), rtol=1e-10)
    paged_ds.warm(t0s, t1s, U)

    # end-to-end through the driver: a paged solver run must match the
    # unpaged one (the fan-out stays a host page loop under the AOT cache)
    from nngparareal_tpu import Config, RKSolver, Parareal

    cfg = dict(Ng=4, Nf=300, G="RK2", F="RK4")
    outs = []
    for th in (128, 10**9):
        s = RKSolver(fv, cfg["Ng"], cfg["Nf"], G=cfg["G"], F=cfg["F"],
                     thresh=th)
        p = Parareal(ode, s, [0, 2], 8, epsilon=5e-7, verbose=None)
        outs.append(p.run(model="parareal"))
    assert outs[0]["k"] == outs[1]["k"]
    np.testing.assert_allclose(outs[0]["u"], outs[1]["u"], rtol=1e-12)
