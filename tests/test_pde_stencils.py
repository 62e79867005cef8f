"""Stencil vector fields vs the reference's dense operators (oracles)."""

import numpy as np
import jax.numpy as jnp

from nngparareal_tpu.systems import Burgers, FHNPDE


def test_burgers_stencil_matches_dense():
    ode = Burgers(d_x=32)
    Dxx, Dx = ode.dense_operators()
    rng = np.random.default_rng(1)
    u = rng.normal(size=32)
    want = Dxx @ u - u * (Dx @ u)
    got = np.asarray(ode._f(0.0, jnp.asarray(u)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_fhn_pde_stencil_matches_dense():
    ode = FHNPDE(d_x=8)
    lap = ode.dense_laplacian()
    rng = np.random.default_rng(2)
    y = rng.normal(size=ode.d)
    d = ode.d_x * ode.d_y
    u1, u2 = y[:d], y[d:]
    a, b, k, tau = 2.8e-4, 5e-3, -5e-3, 0.1
    U = a * (lap @ u1) + u1 - u1 ** 3 - u2 + k
    V = (1.0 / tau) * (b * (lap @ u2) + u1 - u2)
    want = np.concatenate([U, V])
    got = np.asarray(ode._f(0.0, jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


def test_burgers_fused_normalized_field():
    """The algebraically fused [-1,1]-normalized field must equal the
    generic unwrap-rescale wrapper."""
    import jax.numpy as jnp

    ode = Burgers(d_x=48, normalization="-11")
    norm = ode.normalizer
    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, 48)
    want = np.asarray(ode._f(0.0, jnp.asarray(norm.inverse(v)))) * norm.get_scale()
    got = np.asarray(ode.get_vector_field()(0.0, jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-15)
