"""Lane-major GP kernels vs the row-major reference ops."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from nngparareal_tpu.ops import gp as gpops
from nngparareal_tpu.ops import gp_lanes as gplanes

# The ops are plain functions jitted by their production call sites (the
# fused sweep); jit them here too — dispatching the unrolled kernels
# eagerly op-by-op is ~20x slower and is pure suite wall.
_nll_lanes = jax.jit(gplanes.nll_lanes)
_post_lanes = jax.jit(gplanes.posterior_mean_lanes)
_loo_lanes = jax.jit(gplanes.loo_lanes)
_nll_ref = jax.jit(partial(gpops.nll_from_sqd, kernel=gpops.k_se_log10))
_post_ref = jax.jit(partial(gpops.predict_mean_from_sqd,
                            kernel=gpops.k_se_log10))


def _setup(m=14, n=5, B=23, pad=4, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(m, 3))
    mask = np.ones(m)
    mask[m - pad:] = 0.0
    Y = rng.normal(size=(m, n))
    thetas = rng.uniform(-6, 0, size=(B, 2))
    jitters = rng.choice(np.arange(-20.0, -11.0), size=B)
    sqd = gpops.pairwise_sq_dists(jnp.asarray(X), jnp.asarray(X))
    return sqd, jnp.asarray(Y), jnp.asarray(thetas), jnp.asarray(jitters), jnp.asarray(mask)


def test_nll_lanes_matches_rowmajor():
    # B=9 keeps one full jitter cycle while bounding the per-element
    # row-major comparison loop (suite-wall budget)
    sqd, Y, thetas, jitters, mask = _setup(B=9)
    got = np.asarray(_nll_lanes(sqd, Y, thetas, jitters, mask))
    for b in range(thetas.shape[0]):
        for r in range(Y.shape[1]):
            want = _nll_ref(sqd, Y[:, r], thetas[b], jitters[b], mask)
            np.testing.assert_allclose(got[r, b], float(want), rtol=1e-9)


def test_nll_lanes_pertask_targets():
    Y_cols = 5
    sqd, Y, thetas, jitters, mask = _setup(B=Y_cols)
    thetas = thetas[:Y_cols]
    jitters = jitters[:Y_cols]
    Yt = Y[:, None, :]  # (m, 1, B): task b gets target column b
    got = np.asarray(_nll_lanes(sqd, Yt, thetas, jitters, mask))[0]
    for b in range(Y_cols):
        want = _nll_ref(sqd, Y[:, b], thetas[b], jitters[b], mask)
        np.testing.assert_allclose(got[b], float(want), rtol=1e-9)


def test_posterior_lanes_matches_rowmajor():
    sqd, Y, thetas, jitters, mask = _setup(B=5)
    thetas = thetas[:5]
    jitters = jitters[:5]
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=3))
    X = rng.normal(size=(14, 3))
    sqd_q = jnp.asarray(((X - np.asarray(q)) ** 2).sum(-1))
    got = np.asarray(
        _post_lanes(sqd, sqd_q, Y, thetas, jitters, mask)
    )
    for b in range(5):
        want = _post_ref(sqd, sqd_q, Y[:, b], thetas[b], jitters[b], mask)
        np.testing.assert_allclose(got[b], float(want), rtol=1e-9)


def test_loo_lanes_matches_explicit_refits():
    """Closed-form LOO residuals == actually deleting each point and
    refitting (numpy oracle), on the valid rows only."""
    sqd, Y, thetas, jitters, mask = _setup(m=12, n=3, B=4, pad=3, seed=2)
    got = np.asarray(_loo_lanes(sqd, Y, thetas, jitters, mask))

    X = None  # distances already given
    sqd_np = np.asarray(sqd)
    mask_np = np.asarray(mask)
    valid = np.where(mask_np > 0)[0]
    for b in range(thetas.shape[0]):
        th = np.asarray(thetas[b])
        K_full = 10.0 ** th[1] * np.exp(-0.5 * 10.0 ** (-th[0]) * sqd_np)
        K_full = K_full + np.eye(len(mask_np)) * 10.0 ** float(jitters[b])
        for r in range(Y.shape[1]):
            y = np.asarray(Y[:, r])
            ssr = 0.0
            for i in valid:
                tr = np.array([j for j in valid if j != i])
                K = K_full[np.ix_(tr, tr)]
                kq = K_full[i, tr]
                mu = kq @ np.linalg.solve(K, y[tr])
                ssr += (mu - y[i]) ** 2
            np.testing.assert_allclose(got[r, b], ssr, rtol=1e-8)
