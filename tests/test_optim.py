"""Batched Nelder-Mead vs scipy.optimize (the optimizer it replaces)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize

from nngparareal_tpu.ops.optim import nelder_mead, grid_search


def _quad(pts):
    # (B, C, 2) -> (B, C); offset quadratic bowls, one per task
    offs = jnp.arange(pts.shape[0], dtype=pts.dtype)[:, None]
    return ((pts[..., 0] - offs) ** 2 + 2.0 * (pts[..., 1] + offs) ** 2)


def test_batched_quadratics():
    B = 5
    x0 = jnp.zeros((B, 2)) + 3.0
    x, f, iters = nelder_mead(_quad, x0, max_iters=300, fatol=1e-10, xatol=1e-10)
    x = np.asarray(x)
    for b in range(B):
        np.testing.assert_allclose(x[b], [b, -b], atol=1e-4)


def test_matches_scipy_on_rosenbrock():
    def rosen_np(z):
        return (1 - z[0]) ** 2 + 100 * (z[1] - z[0] ** 2) ** 2

    def rosen(pts):
        return (1 - pts[..., 0]) ** 2 + 100 * (pts[..., 1] - pts[..., 0] ** 2) ** 2

    starts = np.array([[-1.2, 1.0], [0.5, 0.5], [2.0, -1.0]])
    x, f, _ = nelder_mead(
        rosen, jnp.asarray(starts), max_iters=600, fatol=1e-10, xatol=1e-10
    )
    for i, s in enumerate(starts):
        ref = minimize(
            rosen_np, s, method="Nelder-Mead",
            options={"fatol": 1e-10, "xatol": 1e-10, "maxiter": 600},
        )
        assert float(f[i]) <= ref.fun + 1e-6, (i, float(f[i]), ref.fun)


def test_handles_inf_objective():
    def obj(pts):
        # invalid region x<0 -> inf, minimum at x=1
        v = (pts[..., 0] - 1.0) ** 2 + pts[..., 1] ** 2
        return jnp.where(pts[..., 0] < 0, jnp.inf, v)

    x, f, _ = nelder_mead(
        obj, jnp.asarray([[2.0, 2.0]]), max_iters=300, fatol=1e-9, xatol=1e-9
    )
    np.testing.assert_allclose(np.asarray(x[0]), [1.0, 0.0], atol=1e-3)


def test_grid_search():
    grid = jnp.asarray(np.mgrid[-2:2:41j, -2:2:41j].reshape(2, -1).T)[None]

    def obj(pts):
        return (pts[..., 0] - 0.5) ** 2 + (pts[..., 1] + 1.0) ** 2

    x, f = grid_search(obj, grid)
    np.testing.assert_allclose(np.asarray(x[0]), [0.5, -1.0], atol=0.06)


def test_nelder_mead_fixed_matches_while_version():
    """The fori_loop NM (scan-safe) reaches the same minima as the
    while_loop NM on a batch of shifted Rosenbrock problems."""
    import jax.numpy as jnp
    from nngparareal_tpu.ops.optim import nelder_mead, nelder_mead_fixed

    def obj(pts):  # (B, C, 2) -> (B, C)
        x, y = pts[..., 0], pts[..., 1]
        return (1.0 - x) ** 2 + 100.0 * (y - x * x) ** 2

    x0 = jnp.asarray([[-1.2, 1.0], [2.0, 2.0], [0.0, 0.0], [-0.5, 1.5]])
    xw, fw, _ = nelder_mead(obj, x0, max_iters=500, fatol=1e-10, xatol=1e-10)
    xf, ff = nelder_mead_fixed(obj, x0, iters=500, fatol=1e-10, xatol=1e-10)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xw), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ff), np.asarray(fw), atol=1e-10)
    np.testing.assert_allclose(np.asarray(xf), np.ones((4, 2)), atol=1e-4)
