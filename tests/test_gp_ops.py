"""Masked GP linalg vs a dense numpy reference GP (SURVEY.md section 7 step 5)."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from nngparareal_tpu.ops import gp as gpops

# jitted aliases: the ops are plain functions (their production call
# sites are jitted sweeps); eager dispatch is pure suite wall
_nll_log = jax.jit(partial(gpops.nll_from_sqd, kernel=gpops.k_se_log10))
_nll_lin = jax.jit(partial(gpops.nll_from_sqd, kernel=gpops.k_se_linear))
_post_log = jax.jit(partial(gpops.predict_mean_from_sqd,
                            kernel=gpops.k_se_log10))


def _ref_nll(x, y, theta, jitter, kernel="log10"):
    """Plain numpy NLL on the unpadded data, mirroring the reference's
    formula (models.py:240-252, 317-330)."""
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    if kernel == "log10":
        sx, sy = theta
        K = 10.0 ** sy * np.exp(-0.5 * 10.0 ** (-sx) * d2)
    else:
        sx, sy = theta
        K = sy ** 2 * np.exp(-0.5 * d2 / sx ** 2)
    K = K + np.eye(len(y)) * 10.0 ** jitter
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
    return (
        0.5 * y @ alpha
        + np.log(np.diag(L)).sum()
        + 0.5 * len(y) * np.log(2 * np.pi)
    )


def test_masked_nll_equals_dense_reference():
    rng = np.random.default_rng(3)
    M, pad, d = 12, 7, 3
    x = rng.normal(size=(M, d))
    y = rng.normal(size=M)
    theta = np.array([-1.5, -0.5])
    jitter = -16.0

    want = _ref_nll(x, y, theta, jitter, "log10")

    X = np.zeros((M + pad, d))
    X[:M] = x
    Y = np.zeros(M + pad)
    Y[:M] = y
    mask = np.zeros(M + pad)
    mask[:M] = 1.0
    sqd = gpops.pairwise_sq_dists(jnp.asarray(X), jnp.asarray(X))
    got = _nll_log(
        sqd, jnp.asarray(Y), jnp.asarray(theta), jitter, jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-10)


def test_masked_nll_linear_kernel():
    rng = np.random.default_rng(5)
    M, pad = 9, 4
    x = rng.normal(size=(M, 2))
    y = rng.normal(size=M)
    theta = np.array([0.7, 1.3])
    jitter = -14.0
    want = _ref_nll(x, y, theta, jitter, "linear")
    X = np.vstack([x, 99.0 * np.ones((pad, 2))])  # garbage padding
    Y = np.concatenate([y, np.full(pad, -7.0)])
    mask = np.concatenate([np.ones(M), np.zeros(pad)])
    sqd = gpops.pairwise_sq_dists(jnp.asarray(X), jnp.asarray(X))
    got = _nll_lin(
        sqd, jnp.asarray(Y), jnp.asarray(theta), jitter, jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-10)


def test_posterior_mean_matches_reference():
    rng = np.random.default_rng(11)
    M, pad, d = 15, 6, 2
    x = rng.normal(size=(M, d))
    y = rng.normal(size=M)
    q = rng.normal(size=d)
    theta = np.array([-2.0, 0.0])
    jitter = -15.0

    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    K = 10.0 ** theta[1] * np.exp(-0.5 * 10.0 ** (-theta[0]) * d2)
    K = K + np.eye(M) * 10.0 ** jitter
    kq = 10.0 ** theta[1] * np.exp(
        -0.5 * 10.0 ** (-theta[0]) * ((x - q) ** 2).sum(-1)
    )
    want = kq @ np.linalg.solve(K, y)

    X = np.vstack([x, np.zeros((pad, d))])
    Y = np.concatenate([y, np.zeros(pad)])
    mask = np.concatenate([np.ones(M), np.zeros(pad)])
    sqd_xx = gpops.pairwise_sq_dists(jnp.asarray(X), jnp.asarray(X))
    sqd_xq = gpops.sq_dists_to(jnp.asarray(q), jnp.asarray(X))
    got = _post_log(
        sqd_xx, sqd_xq, jnp.asarray(Y), jnp.asarray(theta), jitter,
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-9)


def test_failed_cholesky_maps_to_inf():
    # wildly scaled kernel with zero jitter-> NaN/Inf NLL must become +inf
    X = jnp.asarray(np.ones((4, 2)))
    sqd = gpops.pairwise_sq_dists(X, X)
    got = _nll_log(
        sqd, jnp.asarray(np.ones(4)), jnp.asarray([8.0, 8.0]), -30.0,
        jnp.ones(4),
    )
    assert np.isinf(float(got))
