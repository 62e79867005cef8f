"""Precision-explicit blocked Cholesky for large f32 Gram scoring.

Why this exists: the GParareal hyperparameter search scores O(10^2-10^3)
candidate Grams per iteration whose size tracks the accumulated dataset
(11k+ rows at Hopf N=512). ``score_dtype=float32`` keeps that cubic cost
on the MXU — but XLA's native ``cholesky``/``triangular_solve`` HLOs
expand to blocked algorithms whose internal matmuls run at the backend's
DEFAULT precision, which on TPU means bf16 multiplications (~8 mantissa
bits). A smooth SE-kernel Gram has condition number far beyond 2^8, so on
the chip the native f32 factorization fails (NaN -> +inf NLL) for every
non-degenerate length-scale, silently steering the grid search to
near-diagonal Grams (sigma_x -> 0) — the only candidates a bf16-grade
factorization can survive. Measured consequence on Hopf N=512: the
selected theta's holdout error at the convergence frontier equals the
data's own std (the GP adds nothing, conv crawls +2/iter), while a
mid-grid theta the f64 NLL prefers predicts 240x better
(NOTES_ROUND5.md, scripts/dev/gp512_theta_diag findings).

This module re-implements the factorization with every contraction as an
explicit ``dot_general`` pinned to ``Precision.HIGHEST`` (6-pass bf16 =
true f32 accumulation on the MXU) and the sequential parts (diagonal
block factor, triangular inverse, forward substitution) as f32 VPU
recurrences under ``fori_loop`` — no ``cholesky``/``triangular_solve``
HLO anywhere, so backend-internal precision defaults cannot leak in.
Cost: O(M^3) MXU work identical to the native path up to a small constant
(the trailing update does not exploit triangularity), plus O(M) sequential
rank-1 steps.

The reference has no analogue (its GParareal scores in IEEE f64 NM on
CPU, models.py:317-330); this is the TPU-native price of keeping the
scoring Cholesky on the MXU without inheriting its bf16 internals.
"""

import jax
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST


def _diag_block_chol(G):
    """Cholesky of one (bs, bs) block by rank-1 right-looking recurrence.

    Pure element-wise/VPU f32 ops — exact IEEE f32 at every step. A
    failed factorization (non-positive pivot) produces NaN via sqrt and
    propagates, matching ops.gp's NaN -> +inf NLL convention.
    """
    bs = G.shape[-1]
    rows = jnp.arange(bs)

    def body(i, carry):
        G, L = carry
        piv = jnp.sqrt(G[i, i])
        col = jnp.where(rows > i, G[:, i] / piv, 0.0)
        col = col.at[i].set(piv)
        L = L.at[:, i].set(col)
        G = G - col[:, None] * col[None, :]
        return G, L

    _, L = lax.fori_loop(0, bs, body, (G, jnp.zeros_like(G)))
    return L


def _tri_inv_lower(L):
    """inv(L) for (bs, bs) lower-triangular L by forward substitution.

    Row-sequential: X[i] = (e_i - L[i, :i] @ X[:i]) / L[i, i]; the inner
    contraction is a masked matvec at HIGHEST precision.
    """
    bs = L.shape[-1]
    cols = jnp.arange(bs)
    eye = jnp.eye(bs, dtype=L.dtype)

    def body(i, X):
        li = jnp.where(cols < i, L[i, :], 0.0)
        row = (eye[i] - jnp.dot(li, X, precision=_HI)) / L[i, i]
        return X.at[i, :].set(row)

    return lax.fori_loop(0, bs, body, jnp.zeros_like(L))


def chol_diag_solve(Kj, ym, bs=256):
    """(diag(L), z) with L = chol(Kj) lower and L z = ym.

    Exactly the two factorization products the GP NLL consumes
    (ops.gp.gp_nll): logdet via diag(L), quadratic form via ||z||^2.
    Kj must already carry its jitter/masking (see ops.gp._masked_gram);
    padded identity rows factor to 1s on the diagonal and zeros in z, so
    the caller's mask-weighted reductions are unaffected.

    M is padded in-graph to a multiple of ``bs`` with an identity
    diagonal extension (log contribution 0, z contribution 0).
    """
    M = Kj.shape[-1]
    bs = min(bs, M)
    pad = (-M) % bs
    if pad:
        Kp = jnp.zeros((M + pad, M + pad), Kj.dtype)
        Kp = Kp.at[:M, :M].set(Kj)
        Kp = Kp.at[jnp.arange(M, M + pad), jnp.arange(M, M + pad)].set(1.0)
        Kj = Kp
        ym = jnp.concatenate([ym, jnp.zeros((pad,), ym.dtype)])
        M = M + pad
    nb = M // bs
    ridx = jnp.arange(M)

    def body(j, carry):
        L, z = carry
        r0 = j * bs
        cmask = (ridx < r0).astype(Kj.dtype)
        Lm = L * cmask[None, :]  # computed columns only
        rowpan = lax.dynamic_slice(Lm, (r0, 0), (bs, M))
        G = lax.dynamic_slice(Kj, (r0, r0), (bs, bs)) - jnp.dot(
            rowpan, rowpan.T, precision=_HI)
        Ljj = _diag_block_chol(G)
        inv = _tri_inv_lower(Ljj)
        T = lax.dynamic_slice(Kj, (0, r0), (M, bs)) - jnp.dot(
            Lm, rowpan.T, precision=_HI)
        X = jnp.dot(T, inv.T, precision=_HI)
        X = X * (ridx >= r0 + bs).astype(Kj.dtype)[:, None]
        X = lax.dynamic_update_slice(X, Ljj, (r0, 0))
        L = lax.dynamic_update_slice(L, X, (0, r0))
        rhs = lax.dynamic_slice(ym, (r0,), (bs,)) - jnp.dot(
            rowpan, z * cmask, precision=_HI)
        zj = jnp.dot(inv, rhs, precision=_HI)
        z = lax.dynamic_update_slice(z, zj, (r0,))
        return L, z

    L, z = lax.fori_loop(
        0, nb, body,
        (jnp.zeros_like(Kj), jnp.zeros((M,), Kj.dtype)),
    )
    return jnp.diagonal(L), z
