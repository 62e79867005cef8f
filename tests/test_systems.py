"""System zoo: vector fields, normalization round-trips, configs."""

import numpy as np
import jax.numpy as jnp
import pytest

from nngparareal_tpu.systems import (
    FHNODE, Rossler, Hopf, DblPend, Brusselator, Lorenz, ThomasLabyrinth,
    FHNPDE, Burgers, DiffReact, make_system,
)
from nngparareal_tpu.systems.configs import Config


ALL_ODES = [FHNODE, Rossler, DblPend, Brusselator, Lorenz, ThomasLabyrinth]


@pytest.mark.parametrize("cls", ALL_ODES)
def test_identity_vs_normalized_consistency(cls):
    """d/dt of the normalized state must equal scale * f(unnormalized)."""
    raw = cls()
    norm = cls(normalization="-11")
    f_raw = raw.get_vector_field()
    f_nrm = norm.get_vector_field()
    rng = np.random.default_rng(0)
    u_phys = raw.get_init_cond() + 0.01 * rng.normal(size=raw.get_dim())
    u_nrm = norm.normalizer.fit(u_phys)
    want = np.asarray(f_raw(0.3, jnp.asarray(u_phys))) * norm.normalizer.get_scale()
    got = np.asarray(f_nrm(0.3, jnp.asarray(u_nrm)))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_normalize_roundtrip():
    ode = Lorenz(normalization="-11")
    u = np.array([1.0, -3.0, 20.0])
    v = ode.normalizer.fit(u)
    np.testing.assert_allclose(ode.normalizer.inverse(v), u, rtol=1e-14)


def test_lorenz_field_values():
    ode = Lorenz()
    f = ode.get_vector_field()
    u = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(f(0.0, u)),
        [10.0 * (2 - 1), 28 * 1 - 2 - 1 * 3, 1 * 2 - 8 / 3 * 3],
        rtol=1e-14,
    )


def test_hopf_nonautonomous_third_coord():
    ode = Hopf(tspan=(-20, 500))
    f = ode.get_vector_field()
    out = np.asarray(f(0.0, jnp.array([0.3, -0.2, 100.0])))
    assert out[2] == 1.0
    mu = 100.0 / 500.0 - 0.3 ** 2 - (-0.2) ** 2
    np.testing.assert_allclose(out[0], -(-0.2) + 0.3 * mu, rtol=1e-14)


def test_burgers_conserves_shape():
    ode = Burgers(d_x=32)
    f = ode.get_vector_field()
    u = jnp.asarray(ode.get_init_cond())
    out = f(0.0, u)
    assert out.shape == (32,)
    # constant state: Dxx@c = 0 (periodic), Dx@c = 0 -> f = 0
    c = jnp.ones(32) * 0.7
    np.testing.assert_allclose(np.asarray(f(0.0, c)), 0.0, atol=1e-12)


def test_fhn_pde_dims_and_u0_reproducible():
    ode1 = FHNPDE(d_x=6)
    ode2 = FHNPDE(d_x=6)
    assert ode1.get_dim() == 72
    np.testing.assert_array_equal(ode1.get_init_cond(), ode2.get_init_cond())
    f = ode1.get_vector_field()
    assert f(0.0, jnp.asarray(ode1.get_init_cond())).shape == (72,)


def test_diffreact_dims():
    ode = DiffReact(d_x=5)
    assert ode.get_dim() == 50
    f = ode.get_vector_field()
    assert f(0.0, jnp.asarray(ode.get_init_cond())).shape == (50,)


def test_configs_match_paper_values():
    c = Config(FHNODE()).get()
    assert (c["N"], c["Ng"], c["Nf"], c["G"], c["F"]) == (40, 4, 4000, "RK2", "RK4")
    c = Config(Hopf(), N=32).get()
    assert (c["N"], c["Ng"], c["Nf"]) == (32, 64, 5440)
    c = Config(ThomasLabyrinth(), N=512).get()
    assert c["tspan"] == [0, 100] and c["Ng"] == 10
    c = Config(Brusselator()).get()
    assert (c["N"], c["Ng"], c["Nf"]) == (25, 10, 1000)
    c = Config(Lorenz()).get()
    assert (c["N"], c["Ng"], c["Nf"]) == (50, 6, 450)
    c = Config(DblPend()).get()
    assert (c["N"], c["Ng"], c["Nf"]) == (32, 97, 6790)
    c = Config(Rossler()).get()
    assert (c["N"], c["Ng"], c["Nf"]) == (40, 2250, 112500)
    c = Config(FHNPDE(d_x=10), d_x=10).get()
    assert (c["N"], c["Ng"], c["G"], c["F"]) == (512, 3, "RK2", "RK8")


def test_registry_legacy_names():
    ode, params = make_system("non_aut512_n")
    assert isinstance(ode, Hopf) and params["N"] == 512
    assert not ode.normalizer.is_identity
    ode, _ = make_system("lorenz")
    assert isinstance(ode, Lorenz) and ode.normalizer.is_identity
    ode, _ = make_system("burgers_n", d_x=16)
    assert isinstance(ode, Burgers)
