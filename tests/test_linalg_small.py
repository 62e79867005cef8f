"""Unrolled tiny-matrix Cholesky/solves vs numpy."""

import numpy as np
import jax
import jax.numpy as jnp

from nngparareal_tpu.ops.linalg_small import (
    cholesky_small,
    solve_lower_small,
    solve_upper_small,
    chol_solve_small,
)

# jit the unrolled kernels (production call sites are jitted sweeps);
# eager per-op dispatch of the unrolled recurrences is pure suite wall
_chol = jax.jit(cholesky_small)
_sol_l = jax.jit(solve_lower_small)
_sol_u = jax.jit(solve_upper_small)
_chol_solve = jax.jit(chol_solve_small)


def _spd(rng, m):
    A = rng.normal(size=(m, m))
    return A @ A.T + m * np.eye(m)


def test_cholesky_matches_numpy():
    rng = np.random.default_rng(0)
    for m in (1, 2, 5, 18, 31):
        A = _spd(rng, m)
        L = np.asarray(_chol(jnp.asarray(A)))
        np.testing.assert_allclose(L, np.linalg.cholesky(A), rtol=1e-10,
                                   atol=1e-12)


def test_batched_cholesky():
    rng = np.random.default_rng(1)
    As = np.stack([_spd(rng, 12) for _ in range(7)])
    Ls = np.asarray(_chol(jnp.asarray(As)))
    for i in range(7):
        np.testing.assert_allclose(Ls[i], np.linalg.cholesky(As[i]),
                                   rtol=1e-10, atol=1e-12)


def test_triangular_solves():
    rng = np.random.default_rng(2)
    m = 15
    L = np.linalg.cholesky(_spd(rng, m))
    y = rng.normal(size=m)
    z = np.asarray(_sol_l(jnp.asarray(L), jnp.asarray(y)))
    np.testing.assert_allclose(z, np.linalg.solve(L, y), rtol=1e-10)
    x = np.asarray(_sol_u(jnp.asarray(L.T), jnp.asarray(y)))
    np.testing.assert_allclose(x, np.linalg.solve(L.T, y), rtol=1e-10)


def test_chol_solve():
    rng = np.random.default_rng(3)
    m = 20
    A = _spd(rng, m)
    L = np.linalg.cholesky(A)
    y = rng.normal(size=m)
    alpha = np.asarray(_chol_solve(jnp.asarray(L), jnp.asarray(y)))
    np.testing.assert_allclose(alpha, np.linalg.solve(A, y), rtol=1e-9)


def test_non_psd_propagates_nan():
    A = -jnp.eye(4)
    L = cholesky_small(A)
    assert bool(jnp.any(jnp.isnan(L)))


def test_vmap_and_jit():
    rng = np.random.default_rng(4)
    As = jnp.asarray(np.stack([_spd(rng, 10) for _ in range(32)]))
    ys = jnp.asarray(rng.normal(size=(32, 10)))
    f = jax.jit(jax.vmap(lambda A, y: chol_solve_small(cholesky_small(A), y)))
    out = np.asarray(f(As, ys))
    for i in range(32):
        np.testing.assert_allclose(
            out[i], np.linalg.solve(np.asarray(As[i]), np.asarray(ys[i])),
            rtol=1e-9,
        )
