"""Gaussian-process linear algebra, batched and mask-padded for XLA.

The reference trains one single-output GP per state coordinate with a
squared-exponential kernel and selects hyperparameters by minimising the
Cholesky negative log marginal likelihood (reference models.py:86-92,
145-155, 240-252, 303-330). Here every kernel/Cholesky/NLL op takes an
explicit validity mask so that datasets of *dynamic* size (they grow every
parareal iteration) can live in fixed-capacity padded buffers: padded rows
are replaced by identity rows in the Gram matrix and zeros in the targets,
contributing exactly zero to both the solve and the log-determinant. This
is what lets the whole hyperparameter search run as one static-shape
batched program on the MXU instead of the reference's process-pool fan-out
of scipy optimisations.
"""

import math

import jax
import jax.numpy as jnp

from nngparareal_tpu.ops.chol_blocked import chol_diag_solve
from nngparareal_tpu.ops.linalg_small import (
    cholesky_small,
    solve_lower_small,
    chol_solve_small,
)

_LOG_2PI = math.log(2 * math.pi)

# below this size, use the trace-time-unrolled Cholesky/solves: XLA's
# blocked while-loop cholesky is both slow and (on some TPU toolchains)
# unstable for huge batches of tiny f64 matrices
_SMALL_M = 48


def pairwise_sq_dists(x, y):
    """Squared euclidean distances, (Nx, d) x (Ny, d) -> (Nx, Ny).

    EXACT difference form (like the reference's scipy cdist,
    models.py:177,306), NOT the matmul expansion |x|^2+|y|^2-2xy: the
    expansion's cancellation error is ~|x|^2 * eps absolute, which on the
    time-augmented Hopf systems (|x|^2 ~ 1e3) is ~1e-13 — LARGER than the
    true squared distances (~1e-12) between a query and its own
    convergence history at late iterations. Those cluster geometries are
    exactly what the near-singular GP interpolants resolve, so the
    expansion form silently destroys late-iteration prediction quality
    (measured: Hopf-32 K=12-15 with the expansion vs 9-10 published).
    Large inputs are processed in row blocks to bound the (bs, Ny, d)
    intermediate.
    """
    Nx, d = x.shape
    Ny = y.shape[0]
    if Nx * Ny * d <= (1 << 22):
        diff = x[:, None, :] - y[None, :, :]
        return jnp.sum(diff * diff, axis=-1)
    # blocked: bs rows of x at a time (bs * Ny * d * 8B <= ~64 MB)
    bs = max(1, (1 << 23) // max(Ny * d, 1))
    while Nx % bs:
        bs -= 1

    def row_block(xb):
        diff = xb[:, None, :] - y[None, :, :]
        return jnp.sum(diff * diff, axis=-1)

    out = jax.lax.map(row_block, x.reshape(Nx // bs, bs, d))
    return out.reshape(Nx, Ny)


def sq_dists_to(query, X):
    """Squared distances of each row of X (CAP, d) to a single query (d,)."""
    diff = X - query[None, :]
    return jnp.sum(diff * diff, axis=-1)


def k_se_log10(sqd, theta):
    """SE kernel in log10 parameterisation: 10^sy * exp(-0.5 * 10^-sx * d2).

    Matches the reference's nnGParareal kernel ``k_gauss``
    (models.py:145-148); theta = (sigma_x, sigma_y) are log10-scale.
    """
    sigma_x, sigma_y = theta[0], theta[1]
    return 10.0 ** sigma_y * jnp.exp(-0.5 * (10.0 ** (-sigma_x)) * sqd)


def k_se_linear(sqd, theta):
    """SE kernel in linear parameterisation: sy^2 * exp(-0.5 d2 / sx^2).

    Matches the reference's full-GP (GParareal) kernel ``kernel_np``
    (models.py:303-307).
    """
    sigma_x, sigma_y = theta[0], theta[1]
    return (sigma_y ** 2) * jnp.exp(-0.5 * sqd / (sigma_x ** 2))


def _masked_gram_abs(K, mask, jitter_abs):
    """_masked_gram with the jitter given in absolute (linear) scale."""
    m2 = mask[:, None] * mask[None, :]
    Km = K * m2 + jnp.diag(1.0 - mask)
    M = K.shape[0]
    return Km + jitter_abs * jnp.eye(M, dtype=K.dtype)


def _masked_gram(K, mask, jitter_pow):
    """Zero out padded rows/cols and put ones on their diagonal.

    K: (M, M) raw kernel values, mask: (M,) 1.0 valid / 0.0 padding.
    Returns K_masked + 10^jitter * I (jitter also on padded diagonal, which
    keeps the padded block exactly lower-triangular-stable and contributes
    log(sqrt(1 + 10^jitter)) ~ 0 only through masked-out logdet terms).
    """
    return _masked_gram_abs(K, mask, 10.0 ** jitter_pow)


def gp_fit(K, y, jitter_pow, mask):
    """Cholesky fit of a masked GP: returns (L, alpha).

    alpha solves (K_masked + 10^jitter I) alpha = y_masked. Padded entries
    of alpha come out ~0 because their rows are identity and y is zeroed.
    Reference: models.py:86-92 (_fit_gp_jit).
    """
    Kj = _masked_gram(K, mask, jitter_pow)
    ym = y * mask
    if K.shape[-1] <= _SMALL_M:
        L = cholesky_small(Kj)
        alpha = chol_solve_small(L, ym)
        return L, alpha
    L = jnp.linalg.cholesky(Kj)
    z = jax.scipy.linalg.solve_triangular(L, ym, lower=True)
    alpha = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
    return L, alpha


def gp_nll(K, y, jitter_pow, mask, rel_floor=None):
    """Masked negative log marginal likelihood.

    nll = 0.5 y^T alpha + sum_valid log diag(L) + (count/2) log 2pi,
    identical (up to padding) to the reference models.py:240-252 /
    317-330. Non-finite values (failed Cholesky) map to +inf so that the
    optimiser discards them, mirroring the reference's NaN->inf guard
    (models.py:247-252, 324-330). For small m the quadratic term uses
    0.5 ||L^-1 y||^2, skipping the back-substitution entirely.

    ``rel_floor``: scoring-only relative jitter floor — the effective
    jitter is max(10^jitter_pow, rel_floor * gersh(K)) where gersh is the
    Gershgorin bound on lambda_max (max masked absolute row sum), so the
    floor adapts per candidate: ~sigma_y^2 for a near-diagonal Gram,
    ~m sigma_y^2 for a near-rank-1 one. The reference's jitter grid
    10^{-20..-12} (models.py:387) presumes IEEE f64; relative to any
    realistic Gram those absolute values sit far below f32 resolution,
    so in a down-cast scoring pass they cannot regularise anything —
    they only decide where the f32 factorization happens to fail. The
    floor makes every candidate factorable and ranks thetas by the NLL
    of a slightly-regularised model instead; the SELECTED theta's
    posterior is still fit in f64 at the grid jitter (models/gp.py fit +
    _validate_alphas walk).

    Large f32 Grams additionally route through the precision-explicit
    blocked factorization (ops/chol_blocked.py) instead of the native
    ``cholesky``/``triangular_solve`` HLOs, whose TPU expansions run
    their internal matmuls at bf16 default precision and fail for every
    well-conditioned-in-f32-but-not-in-bf16 candidate (the Hopf N=512
    degenerate-theta root cause; chol_blocked.py module docstring).
    """
    jit_abs = 10.0 ** jitter_pow
    if rel_floor is not None:
        gersh = jnp.max(
            jnp.sum(jnp.abs(K) * (mask[:, None] * mask[None, :]), axis=1)
        )
        jit_abs = jnp.maximum(jit_abs, rel_floor * gersh)
    Kj = _masked_gram_abs(K, mask, jit_abs)
    ym = y * mask
    count = jnp.sum(mask)
    if K.shape[-1] <= _SMALL_M:
        L = cholesky_small(Kj)
        z = solve_lower_small(L, ym)
        quad = 0.5 * jnp.sum(z * z)
        diagL = jnp.diagonal(L, axis1=-2, axis2=-1)
    elif K.dtype == jnp.float32:
        diagL, z = chol_diag_solve(Kj, ym)
        quad = 0.5 * jnp.sum(z * z)
    else:
        L = jnp.linalg.cholesky(Kj)
        z = jax.scipy.linalg.solve_triangular(L, ym, lower=True)
        quad = 0.5 * jnp.sum(z * z)
        diagL = jnp.diagonal(L, axis1=-2, axis2=-1)
    logdet = jnp.sum(jnp.where(mask > 0, jnp.log(diagL[..., :mask.shape[0]]), 0.0))
    nll = quad + logdet + 0.5 * count * _LOG_2PI
    return jnp.where(jnp.isfinite(nll), nll, jnp.inf)


def gp_posterior_mean(k_star, alpha):
    """Posterior mean k(X, x*)^T alpha; k_star already mask-consistent."""
    return jnp.dot(k_star, alpha)


def nll_from_sqd(sqd, y, theta, jitter_pow, mask, kernel, rel_floor=None):
    """NLL given a precomputed squared-distance Gram matrix."""
    K = kernel(sqd, theta)
    return gp_nll(K, y, jitter_pow, mask, rel_floor=rel_floor)


def predict_mean_from_sqd(sqd_xx, sqd_xq, y, theta, jitter_pow, mask, kernel):
    """Posterior mean at a query from precomputed squared distances.

    sqd_xx: (M, M) train/train, sqd_xq: (M,) train/query, y: (M,).
    """
    K = kernel(sqd_xx, theta)
    L, alpha = gp_fit(K, y, jitter_pow, mask)
    k_star = kernel(sqd_xq, theta) * mask
    return gp_posterior_mean(k_star, alpha)
