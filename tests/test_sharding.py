"""Mesh execution: sharded fine fan-out must agree with the single-device
path (the reference's serial/parallel-equivalence discipline,
parareal.py:28-33), here on an 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nngparareal_tpu import FHNODE, Config, RKSolver, Parareal
from nngparareal_tpu.parallel.mesh import make_mesh, shard_fine_fanout
from nngparareal_tpu.ops.rk import integrate_last


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_fanout_matches_vmap(mesh):
    ode = FHNODE(normalization="-11")
    f = ode.get_vector_field()
    Nf = 200

    def fan(t0s, t1s, U):
        def one(t0, t1, u):
            return integrate_last(f, "RK4", t0, (t1 - t0) / Nf, Nf, u)

        return jax.vmap(one)(t0s, t1s, U)

    sharded = shard_fine_fanout(fan, mesh)
    rng = np.random.default_rng(0)
    N = 16
    t0s = jnp.arange(N, dtype=float)
    t1s = t0s + 1.0
    U = jnp.asarray(rng.normal(size=(N, 2)) * 0.1)
    np.testing.assert_allclose(
        np.asarray(sharded(t0s, t1s, U)),
        np.asarray(fan(t0s, t1s, U)),
        rtol=1e-13, atol=1e-14,
    )


def test_full_run_on_mesh_matches_serial(mesh):
    def build():
        ode = FHNODE(normalization="-11")
        cfg = Config(ode).get()
        solver = RKSolver(
            ode.get_vector_field(), cfg["Ng"], cfg["Nf"], G=cfg["G"], F=cfg["F"]
        )
        return Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=5e-7,
                        verbose=None)

    out_serial = build().run(model="parareal")
    out_mesh = build().run(model="parareal", mesh=mesh)
    assert out_mesh["k"] == out_serial["k"]
    np.testing.assert_allclose(out_mesh["u"], out_serial["u"], rtol=1e-12)


def test_mesh_with_padding(mesh):
    """N=40 is not divisible by 8 after... it is; use N=20 vs 8 devices to
    exercise the padding path."""
    ode = FHNODE(normalization="-11")
    solver = RKSolver(ode.get_vector_field(), 4, 500, G="RK2", F="RK4")
    p_serial = Parareal(ode, solver, [0, 20], 20, epsilon=5e-7, verbose=None)
    out_serial = p_serial.run(model="parareal")
    p_mesh = Parareal(ode, solver, [0, 20], 20, epsilon=5e-7, verbose=None)
    out_mesh = p_mesh.run(model="parareal", mesh=mesh)
    assert out_mesh["k"] == out_serial["k"]
    np.testing.assert_allclose(out_mesh["u"], out_serial["u"], rtol=1e-12)


def test_mesh_threads_ds_arithmetic(mesh):
    """The mesh traceable must run the solver's ACTUAL fine arithmetic
    (advisor round-3 driver.py:215): with a ds32 fine solver, mesh= and
    single-device runs execute the same compensated-f32 kernels and agree
    exactly; before the fix the mesh path silently rebuilt plain f64."""
    ode = FHNODE(normalization="-11")
    f = ode.get_vector_field()
    solver = RKSolver(f, 4, 500, G="RK2", F="RK4",
                      fine_ds=ode.get_ds_vector_field(), fine="ds")
    p1 = Parareal(ode, solver, [0, 20], 16, epsilon=5e-7, verbose=None)
    out_serial = p1.run(model="parareal")
    p2 = Parareal(ode, solver, [0, 20], 16, epsilon=5e-7, verbose=None)
    out_mesh = p2.run(model="parareal", mesh=mesh)
    assert out_mesh["k"] == out_serial["k"]
    np.testing.assert_allclose(out_mesh["u"], out_serial["u"],
                               rtol=1e-13, atol=1e-14)
