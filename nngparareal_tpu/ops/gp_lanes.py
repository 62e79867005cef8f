"""Lane-major GP kernels: task batch in the LAST axis.

The TPU VPU processes (8 sublanes x 128 lanes) tiles; arrays whose last
dimension is the tiny GP size m (~10-30) waste ~85% of every lane. These
kernels keep the hyperparameter-task batch B (hundreds to thousands) in
the last axis instead: matrices are stored (m, m, B) and every unrolled
Cholesky/substitution step is a (*, B)-wide elementwise op — full lanes,
no control flow, no XLA cholesky.

Used by the nnGParareal hyperparameter search (grid and Nelder-Mead
objectives), where each parareal interval evaluates hundreds of candidate
(theta, jitter) pairs on a shared m x m squared-distance matrix.
"""

import math

import jax.numpy as jnp


def k_se_log10_lanes(sqd, theta):
    """SE kernel values for B candidate thetas at once.

    sqd: (m, m) shared squared distances; theta: (B, 2) log10-scale.
    Returns (m, m, B).
    """
    sx = theta[:, 0]
    sy = theta[:, 1]
    return 10.0 ** sy * jnp.exp(-0.5 * (10.0 ** (-sx)) * sqd[:, :, None])


def k_se_linear_lanes(sqd, theta):
    """Linear-parameterisation SE kernel (the full-GP / GParareal kernel,
    reference models.py:303-307) for B candidate thetas at once.

    sqd: (m, m) shared squared distances; theta: (B, 2) linear scale.
    Returns (m, m, B).
    """
    sx = theta[:, 0]
    sy = theta[:, 1]
    return (sy ** 2) * jnp.exp(-0.5 * sqd[:, :, None] / (sx ** 2))


def masked_gram_lanes(K, mask, jitter_pow):
    """Masked Gram + jitter, lanes layout: K (m, m, B), mask (m,),
    jitter_pow (B,). Padded rows/cols become identity."""
    m = K.shape[0]
    m2 = (mask[:, None] * mask[None, :])[:, :, None]
    eye = jnp.eye(m)
    Km = K * m2 + (eye * (1.0 - mask)[None, :])[:, :, None]
    return Km + eye[:, :, None] * (10.0 ** jitter_pow)[None, None, :]


def cholesky_lanes(A, pivot_floor=None):
    """Cholesky of A (m, m, B), unrolled over columns; all ops (*, B).

    ``pivot_floor`` (e.g. ``64 * eps``) clamps each pivot at
    ``pivot_floor * A[j, j]`` before the sqrt. Near-singular Grams (exact
    duplicate dataset rows with jitter below f64 resolution) then factor
    to a large-but-finite NLL instead of NaN -> +inf: the computed pivot
    at the singular boundary is pure rounding noise of magnitude
    ~m*eps*A_jj anyway, so the clamp keeps the value approximately right
    while making the NLL landscape continuous — deep interpolation basins
    stay evaluable instead of dying by rounding luck (the reference's
    np/jax cholesky failures achieve the same exclusion only
    stochastically).
    """
    m = A.shape[0]
    cols = []  # column j as (m, B)
    for j in range(m):
        s = A[:, j, :]
        if j:
            prior = jnp.stack(cols, axis=0)  # (j, m, B)
            Lj = prior[:, j, :]  # (j, B)
            s = s - jnp.sum(prior * Lj[:, None, :], axis=0)
        sj = s[j]
        if pivot_floor is not None:
            sj = jnp.maximum(sj, pivot_floor * A[j, j, :])
        d = jnp.sqrt(sj)
        col = s / d[None, :]
        col = col.at[j, :].set(d)
        if j:
            keep = (jnp.arange(m) >= j)[:, None]
            col = jnp.where(keep, col, 0.0)
        cols.append(col)
    return jnp.stack(cols, axis=1)  # (m, m, B)


def cholesky_lanes_blocked(A, block=16, pivot_floor=None):
    """Blocked lane-major Cholesky of A (m, m, B).

    The column-unrolled ``cholesky_lanes`` emits an O(m^2)-size graph
    (every column stacks all prior columns), which caps its practical m
    near ~48 (ops/gp.py _SMALL_M) by trace/compile cost, not execution
    cost. This right-looking blocked variant keeps the lane layout (task
    batch B in the last axis, every op (*, B)-wide on the VPU) while the
    graph grows only O((m/block)^2): per block column it unrolls a
    ``block``-step diagonal factorisation, a ``block``-step panel
    triangular solve, and ONE einsum trailing update. That extends the
    lane-major path to the full-GP Gram sizes (hundreds of rows) the
    round-2 review flagged as falling back to row-major XLA cholesky.

    ``pivot_floor`` is applied inside the diagonal blocks exactly as in
    ``cholesky_lanes`` (clamp vs the ORIGINAL diagonal of A).
    """
    m, _, B = A.shape
    b = min(block, m)
    nb = -(-m // b)
    mp = nb * b
    diagA = jnp.stack([A[j, j, :] for j in range(m)], axis=0)  # (m, B)
    if mp != m:
        # pad to a whole number of blocks with identity rows/cols: the
        # padded block factors to I and contributes nothing to real rows
        pad = mp - m
        A = jnp.concatenate([A, jnp.zeros((pad, m, B), A.dtype)], axis=0)
        eye_pad = jnp.zeros((mp, pad, B), A.dtype)
        eye_pad = eye_pad.at[jnp.arange(m, mp), jnp.arange(pad), :].set(1.0)
        A = jnp.concatenate([A, eye_pad], axis=1)
        diagA = jnp.concatenate([diagA, jnp.ones((pad, B), A.dtype)], axis=0)

    L = jnp.zeros_like(A)
    for J in range(nb):
        lo, hi = J * b, (J + 1) * b
        S = A[lo:hi, lo:hi, :]  # (b, b, B) current diagonal block

        # unrolled dense factorisation of the diagonal block
        cols = []
        for j in range(b):
            s = S[:, j, :]
            if j:
                prior = jnp.stack(cols, axis=0)  # (j, b, B)
                Lj = prior[:, j, :]
                s = s - jnp.sum(prior * Lj[:, None, :], axis=0)
            sj = s[j]
            if pivot_floor is not None:
                sj = jnp.maximum(sj, pivot_floor * diagA[lo + j, :])
            d = jnp.sqrt(sj)
            col = s / d[None, :]
            col = col.at[j, :].set(d)
            if j:
                keep = (jnp.arange(b) >= j)[:, None]
                col = jnp.where(keep, col, 0.0)
            cols.append(col)
        Ljj = jnp.stack(cols, axis=1)  # (b, b, B)
        L = L.at[lo:hi, lo:hi, :].set(Ljj)

        if hi == mp:
            break
        # panel solve: P = A[hi:, lo:hi] @ Ljj^-T, column by column
        Apan = A[hi:, lo:hi, :]  # (r, b, B)
        pcols = []
        for j in range(b):
            acc = Apan[:, j, :]
            for t in range(j):
                acc = acc - pcols[t] * Ljj[j, t, :][None, :]
            pcols.append(acc / Ljj[j, j, :][None, :])
        P = jnp.stack(pcols, axis=1)  # (r, b, B)
        L = L.at[hi:, lo:hi, :].set(P)

        # trailing update: A[hi:, hi:] -= P P^T (one batched contraction)
        upd = jnp.einsum("ikb,jkb->ijb", P, P)
        A = A.at[hi:, hi:, :].add(-upd)
    return L[:m, :m, :]


def solve_lower_lanes_blocked(L, Y, block=16):
    """Blocked forward substitution: L Z = Y with L (m, m, B) lower,
    Y (m, r, B). Same O((m/block)^2) graph-size rationale as
    ``cholesky_lanes_blocked``."""
    m = L.shape[0]
    b = min(block, m)
    nb = -(-m // b)
    zs = []  # per-block solved chunks, (b_or_less, r, B)
    for J in range(nb):
        lo, hi = J * b, min((J + 1) * b, m)
        acc = Y[lo:hi]
        if J:
            Zprev = jnp.concatenate(zs, axis=0)  # (lo, r, B)
            Lrow = L[lo:hi, :lo, :]  # (bJ, lo, B)
            acc = acc - jnp.einsum("ikb,krb->irb", Lrow, Zprev)
        # unrolled substitution inside the block
        rows = []
        for j in range(hi - lo):
            a = acc[j]
            for t in range(j):
                a = a - rows[t] * L[lo + j, lo + t, :][None, :]
            rows.append(a / L[lo + j, lo + j, :][None, :])
        zs.append(jnp.stack(rows, axis=0))
    return jnp.concatenate(zs, axis=0)


# unrolled-graph size is the binding constraint for the plain lanes
# kernels; above this m the blocked variants take over automatically
_LANES_UNROLL_M = 48


def nll_lanes_big(sqd, Y, theta, jitter_pow, mask, kernel=k_se_log10_lanes,
                  dtype=None, pivot_floor=None, block=16):
    """Masked GP NLL for B candidates at Gram sizes past the unrolled
    kernels' practical limit: same contract as ``nll_lanes`` but built on
    the blocked lane-major Cholesky/substitution."""
    if dtype is not None:
        sqd = sqd.astype(dtype)
        Y = Y.astype(dtype)
        theta = theta.astype(dtype)
        jitter_pow = jitter_pow.astype(dtype)
        mask = mask.astype(dtype)
    K = kernel(sqd, theta)
    Kj = masked_gram_lanes(K, mask, jitter_pow)
    L = cholesky_lanes_blocked(Kj, block=block, pivot_floor=pivot_floor)
    if Y.ndim == 2:
        Ym = (Y * mask[:, None])[:, :, None]
    else:
        Ym = Y * mask[:, None, None]
    Z = solve_lower_lanes_blocked(L, Ym, block=block)
    quad = 0.5 * jnp.sum(Z * Z, axis=0)
    diag = jnp.stack([L[j, j] for j in range(L.shape[0])], axis=0)
    logdet = jnp.sum(jnp.where(mask[:, None] > 0, jnp.log(diag), 0.0), axis=0)
    count = jnp.sum(mask)
    nll = quad + logdet[None, :] + 0.5 * count * _LOG_2PI
    nll = nll.astype(jnp.promote_types(nll.dtype, jnp.float64))
    return jnp.where(jnp.isfinite(nll), nll, jnp.inf)


def solve_lower_lanes(L, Y):
    """Solve L Z = Y; L (m, m, B), Y (m, r, B) -> Z (m, r, B)."""
    m = L.shape[0]
    zs = []
    for j in range(m):
        acc = Y[j]
        if j:
            zprev = jnp.stack(zs, axis=0)  # (j, r, B)
            Lrow = L[j, :j, :]  # (j, B)
            acc = acc - jnp.sum(zprev * Lrow[:, None, :], axis=0)
        zs.append(acc / L[j, j][None, :])
    return jnp.stack(zs, axis=0)


def solve_upper_lanes(U, Y):
    """Solve U X = Y with U upper-triangular (m, m, B), Y (m, r, B)."""
    m = U.shape[0]
    xs = [None] * m
    done = []
    for idx, j in enumerate(range(m - 1, -1, -1)):
        acc = Y[j]
        if idx:
            xnext = jnp.stack(done, axis=0)  # (idx, r, B) rows j+1.. reversed
            Urow = U[j, j + 1:, :][::-1]  # (idx, B)
            acc = acc - jnp.sum(xnext * Urow[:, None, :], axis=0)
        val = acc / U[j, j][None, :]
        done.append(val)
        xs[j] = val
    return jnp.stack(xs, axis=0)


_LOG_2PI = math.log(2 * math.pi)


def nll_lanes(sqd, Y, theta, jitter_pow, mask, kernel=k_se_log10_lanes,
              dtype=None, pivot_floor=None):
    """Masked GP NLL for B (theta, jitter) candidates sharing one dataset.

    sqd: (m, m); Y: (m, r) targets (r coordinates) or (m, r, B) per-task;
    theta: (B, 2); jitter_pow: (B,); mask: (m,).
    Returns (r, B) NLL values (non-finite -> +inf), in f64.

    ``dtype`` optionally down-casts the *scoring* computation (e.g.
    float32): the NLL is only used to rank hyperparameter candidates, and
    f32 runs natively on the TPU VPU while f64 is emulated. The posterior
    fit stays f64 regardless.
    """
    if dtype is not None:
        sqd = sqd.astype(dtype)
        Y = Y.astype(dtype)
        theta = theta.astype(dtype)
        jitter_pow = jitter_pow.astype(dtype)
        mask = mask.astype(dtype)
    K = kernel(sqd, theta)
    Kj = masked_gram_lanes(K, mask, jitter_pow)
    L = cholesky_lanes(Kj, pivot_floor=pivot_floor)
    if Y.ndim == 2:
        Ym = (Y * mask[:, None])[:, :, None]  # (m, r, 1), broadcasts over B
    else:
        Ym = Y * mask[:, None, None]
    Z = solve_lower_lanes(L, Ym)  # (m, r, B)
    quad = 0.5 * jnp.sum(Z * Z, axis=0)  # (r, B)
    diag = jnp.stack([L[j, j] for j in range(L.shape[0])], axis=0)  # (m, B)
    logdet = jnp.sum(jnp.where(mask[:, None] > 0, jnp.log(diag), 0.0), axis=0)
    count = jnp.sum(mask)
    nll = quad + logdet[None, :] + 0.5 * count * _LOG_2PI
    nll = nll.astype(jnp.promote_types(nll.dtype, jnp.float64))
    return jnp.where(jnp.isfinite(nll), nll, jnp.inf)


def loo_lanes(sqd, Y, theta, jitter_pow, mask, kernel=k_se_log10_lanes,
              dtype=None, pivot_floor=None):
    """Masked leave-one-out squared-residual score for B candidates.

    Closed form (Rasmussen & Williams sec. 5.4.2): with alpha = K^-1 y and
    c = diag(K^-1), the LOO prediction residual at point i is
    alpha_i / c_i — no m separate refits needed. Returns the masked sum of
    squared LOO residuals, shape (r, B), non-finite -> +inf.

    Used to discriminate near-tied NLL optima: an interpolating
    hyperparameter choice (tiny length scale) has near-zero training
    residual and excellent NLL but large LOO residuals, which is exactly
    the failure mode behind late-iteration K inflation on the Hopf family
    (the reference's scipy NM avoids those basins only by the luck of its
    integer starts, models.py:192).
    """
    if dtype is not None:
        sqd = sqd.astype(dtype)
        Y = Y.astype(dtype)
        theta = theta.astype(dtype)
        jitter_pow = jitter_pow.astype(dtype)
        mask = mask.astype(dtype)
    K = kernel(sqd, theta)
    Kj = masked_gram_lanes(K, mask, jitter_pow)
    L = cholesky_lanes(Kj, pivot_floor=pivot_floor)
    if Y.ndim == 2:
        Ym = (Y * mask[:, None])[:, :, None]
    else:
        Ym = Y * mask[:, None, None]
    Z = solve_lower_lanes(L, Ym)
    alpha = solve_upper_lanes(jnp.swapaxes(L, 0, 1), Z)  # (m, r, B)
    m = sqd.shape[0]
    eye = jnp.broadcast_to(jnp.eye(m, dtype=L.dtype)[:, :, None], L.shape)
    W = solve_lower_lanes(L, eye)  # L^-1, (m, m, B)
    cdiag = jnp.sum(W * W, axis=0)  # diag(K^-1) = column sumsq of L^-1
    resid = alpha / cdiag[:, None, :]
    ssr = jnp.sum((resid * resid) * mask[:, None, None], axis=0)  # (r, B)
    ssr = ssr.astype(jnp.promote_types(ssr.dtype, jnp.float64))
    return jnp.where(jnp.isfinite(ssr), ssr, jnp.inf)


def posterior_mean_lanes(sqd, sqd_q, Y, theta, jitter_pow, mask,
                         kernel=k_se_log10_lanes, pivot_floor=None):
    """Posterior means for B per-coordinate (theta, jitter) picks.

    sqd: (m, m); sqd_q: (m,); Y: (m, B) one target column per task;
    theta: (B, 2); jitter_pow: (B,). Returns (B,).
    """
    K = kernel(sqd, theta)
    Kj = masked_gram_lanes(K, mask, jitter_pow)
    L = cholesky_lanes(Kj, pivot_floor=pivot_floor)
    Ym = (Y * mask[:, None])[:, None, :]  # (m, 1, B)
    Z = solve_lower_lanes(L, Ym)
    alpha = solve_upper_lanes(jnp.swapaxes(L, 0, 1), Z)[:, 0, :]  # (m, B)
    k_star = kernel(sqd_q[:, None], theta)[:, 0, :] * mask[:, None]  # (m, B)
    return jnp.sum(k_star * alpha, axis=0)


def posterior_mean_lu(sqd, sqd_q, Y, theta, jitter_pow, mask,
                      kernel=k_se_log10_lanes):
    """Posterior means via batched LU (partial pivoting) instead of the
    lane-major Cholesky.

    At the boundary of the interpolation regime (near-duplicate dataset
    rows, jitter below f64 resolution of the Gram) the Cholesky breaks
    down, but the LINEAR SYSTEM K alpha = y is still solvable by LU with
    partial pivoting and yields the interpolating predictor — this is
    what the reference's scipy pipeline effectively uses at predict time
    (np.linalg.solve, models.py:178), and on the Hopf family those
    boundary interpolants predict near-converged defects to ~1e-11 where
    every well-conditioned candidate stalls at ~1e-6. B small systems
    (coords), so the row-major batched XLA LU is acceptable here — this
    runs once per (interval, coordinate), not inside the theta search.
    """
    m = sqd.shape[0]
    K = kernel(sqd, theta)  # (m, m, B)
    Kj = masked_gram_lanes(K, mask, jitter_pow)
    A = jnp.moveaxis(Kj, -1, 0)  # (B, m, m)
    y = jnp.moveaxis((Y * mask[:, None]), -1, 0)[:, :, None]  # (B, m, 1)
    alpha = jnp.linalg.solve(A, y)[:, :, 0]  # (B, m)
    k_star = kernel(sqd_q[:, None], theta)[:, 0, :] * mask[:, None]  # (m, B)
    return jnp.sum(k_star * alpha.T, axis=0)
