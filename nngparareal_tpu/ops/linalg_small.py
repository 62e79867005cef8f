"""Unrolled dense linear algebra for tiny matrices (m <= ~48).

XLA's generic ``cholesky``/``triangular_solve`` lower to blocked while-loop
algorithms padded to 128-lane tiles — catastrophic for the thousands of
(m x m), m~10-30, f64 factorizations per parareal interval that the nnGP
hyperparameter search performs. These kernels unroll the column recurrence
at trace time into straight-line batched element-wise ops and tiny
contractions, which vmap across the task batch onto the VPU with no
control flow at all.

Failed factorizations (non-PSD) produce NaNs that propagate, matching the
NaN -> +inf convention of ops.gp.
"""

import jax.numpy as jnp


def cholesky_small(A):
    """Cholesky of A (..., m, m), unrolled over columns (m static)."""
    m = A.shape[-1]
    cols = []
    for j in range(m):
        s = A[..., :, j]
        if j:
            Lj = jnp.stack([c[..., j] for c in cols], axis=-1)  # (..., j)
            prior = jnp.stack(cols, axis=-1)  # (..., m, j)
            s = s - jnp.einsum("...ik,...k->...i", prior, Lj)
        d = jnp.sqrt(s[..., j])
        col = s / d[..., None]
        # zero the strict upper part of this column (rows < j)
        if j:
            keep = jnp.arange(m) >= j
            col = jnp.where(keep, col, 0.0)
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def solve_lower_small(L, y):
    """Solve L z = y with L (..., m, m) lower-triangular, y (..., m)."""
    m = L.shape[-1]
    zs = []
    for j in range(m):
        acc = y[..., j]
        if j:
            zprev = jnp.stack(zs, axis=-1)  # (..., j)
            acc = acc - jnp.einsum("...k,...k->...", L[..., j, :j], zprev)
        zs.append(acc / L[..., j, j])
    return jnp.stack(zs, axis=-1)


def solve_upper_small(U, y):
    """Solve U x = y with U (..., m, m) upper-triangular, y (..., m)."""
    m = U.shape[-1]
    xs = [None] * m
    done = []
    for idx, j in enumerate(range(m - 1, -1, -1)):
        acc = y[..., j]
        if idx:
            xnext = jnp.stack(done, axis=-1)  # (..., idx) = x[j+1:] reversed
            Urow = U[..., j, j + 1:][..., ::-1]
            acc = acc - jnp.einsum("...k,...k->...", Urow, xnext)
        val = acc / U[..., j, j]
        done.append(val)
        xs[j] = val
    return jnp.stack(xs, axis=-1)


def chol_solve_small(L, y):
    """Solve (L L^T) alpha = y."""
    z = solve_lower_small(L, y)
    return solve_upper_small(jnp.swapaxes(L, -1, -2), z)


def solve_lower_small_mrhs(L, Y):
    """Solve L Z = Y with L (..., m, m) lower-triangular, Y (..., m, r).

    Multi-right-hand-side forward substitution — lets one factorization
    serve every state coordinate of a GP fit at once.
    """
    m = L.shape[-2]
    zs = []
    for j in range(m):
        acc = Y[..., j, :]
        if j:
            zprev = jnp.stack(zs, axis=-2)  # (..., j, r)
            acc = acc - jnp.einsum("...k,...kr->...r", L[..., j, :j], zprev)
        zs.append(acc / L[..., j, j][..., None])
    return jnp.stack(zs, axis=-2)
