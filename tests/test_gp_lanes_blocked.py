"""Blocked lane-major Cholesky/NLL (ops/gp_lanes.py) vs dense oracles.

The unrolled lane kernels cap at m~48 by graph size; the blocked variants
must agree with jnp.linalg.cholesky / the row-major masked NLL at the
full-GP Gram sizes (m in the hundreds), including non-multiple-of-block
sizes and masked padding rows.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from nngparareal_tpu.ops import gp as gpops
from nngparareal_tpu.ops.gp_lanes import (
    cholesky_lanes,
    cholesky_lanes_blocked,
    solve_lower_lanes_blocked,
    nll_lanes,
    nll_lanes_big,
    k_se_log10_lanes,
    k_se_linear_lanes,
)


# jit the ops under test (their production call sites are jitted sweeps);
# eager dispatch of the blocked/unrolled kernels is pure suite wall
_chol_blk16 = jax.jit(partial(cholesky_lanes_blocked, block=16))
_chol_unrolled = jax.jit(cholesky_lanes)
_solve_blk16 = jax.jit(partial(solve_lower_lanes_blocked, block=16))
_nll_big_lin = jax.jit(partial(nll_lanes_big, kernel=k_se_linear_lanes))
_nll_big_log16 = jax.jit(partial(nll_lanes_big, kernel=k_se_log10_lanes,
                                 block=16))
_nll_lanes_log = jax.jit(partial(nll_lanes, kernel=k_se_log10_lanes))
_gp_nll_ref = jax.jit(gpops.gp_nll)
_k_lin_ref = jax.jit(gpops.k_se_linear)


def _spd(m, B, rng):
    A = rng.normal(size=(B, m, m))
    A = A @ np.swapaxes(A, 1, 2) + m * np.eye(m)
    return np.moveaxis(A, 0, -1)  # (m, m, B)


def test_blocked_cholesky_matches_dense():
    rng = np.random.default_rng(0)
    for m in (5, 16, 48, 96, 130):
        A = _spd(m, 3, rng)
        L = np.asarray(_chol_blk16(jnp.asarray(A)))
        L_ref = np.linalg.cholesky(np.moveaxis(A, -1, 0))
        np.testing.assert_allclose(
            L, np.moveaxis(L_ref, 0, -1), rtol=1e-10, atol=1e-10
        )


def test_blocked_matches_unrolled_small():
    rng = np.random.default_rng(1)
    A = _spd(40, 4, rng)
    Lb = np.asarray(_chol_blk16(jnp.asarray(A)))
    Lu = np.asarray(_chol_unrolled(jnp.asarray(A)))
    np.testing.assert_allclose(Lb, Lu, rtol=1e-12, atol=1e-12)


def test_blocked_solve_lower():
    rng = np.random.default_rng(2)
    m, r, B = 77, 2, 3
    A = _spd(m, B, rng)
    Y = rng.normal(size=(m, r, B))
    L = _chol_blk16(jnp.asarray(A))
    Z = np.asarray(_solve_blk16(L, jnp.asarray(Y)))
    for b in range(B):
        z_ref = np.linalg.solve(
            np.tril(np.asarray(L)[:, :, b]), Y[:, :, b]
        )
        np.testing.assert_allclose(Z[:, :, b], z_ref, rtol=1e-9, atol=1e-10)


def test_nll_big_matches_rowmajor_masked():
    """nll_lanes_big == the row-major masked NLL (gp_nll path) at a Gram
    size above the unrolled cap, with padded rows masked out."""
    rng = np.random.default_rng(3)
    m, nvalid, B = 96, 80, 7
    X = rng.normal(size=(m, 4))
    y = rng.normal(size=(m,))
    mask = np.zeros(m)
    mask[:nvalid] = 1.0
    y = y * mask
    sqd = np.asarray(gpops.pairwise_sq_dists(jnp.asarray(X), jnp.asarray(X)))
    theta = np.column_stack(
        [rng.uniform(0.3, 3.0, B), rng.uniform(0.3, 3.0, B)]
    )
    jit_pow = rng.uniform(-16.0, -8.0, B)

    got = np.asarray(
        _nll_big_lin(
            jnp.asarray(sqd), jnp.asarray(y)[:, None], jnp.asarray(theta),
            jnp.asarray(jit_pow), jnp.asarray(mask),
        )
    )[0]
    for b in range(B):
        K = np.asarray(_k_lin_ref(jnp.asarray(sqd), jnp.asarray(theta[b])))
        ref = float(_gp_nll_ref(jnp.asarray(K), jnp.asarray(y),
                                jit_pow[b], jnp.asarray(mask)))
        np.testing.assert_allclose(got[b], ref, rtol=1e-8)


def test_nll_big_matches_nll_lanes_small():
    """Below the unrolled cap both lane paths agree (log10 kernel)."""
    rng = np.random.default_rng(4)
    m, B = 24, 5
    X = rng.normal(size=(m, 3))
    y = rng.normal(size=(m, 2))
    mask = np.ones(m)
    sqd = np.asarray(gpops.pairwise_sq_dists(jnp.asarray(X), jnp.asarray(X)))
    theta = rng.uniform(-2.0, 1.0, (B, 2))
    jit_pow = np.full(B, -12.0)
    a = np.asarray(_nll_lanes_log(jnp.asarray(sqd), jnp.asarray(y),
                                  jnp.asarray(theta), jnp.asarray(jit_pow),
                                  jnp.asarray(mask)))
    b = np.asarray(_nll_big_log16(jnp.asarray(sqd), jnp.asarray(y),
                                  jnp.asarray(theta), jnp.asarray(jit_pow),
                                  jnp.asarray(mask)))
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10)


def test_gp_grid_score_lanes_same_fit():
    """GParareal(optimizer='grid', score_lanes=True) picks the same
    hyperparameters and NLLs as the row-major scoring on a real fit."""
    from nngparareal_tpu.models.base import Dataset
    from nngparareal_tpu.models.gp import GParareal

    rng = np.random.default_rng(5)
    n, N, rows, cap = 2, 8, 60, 64
    X = rng.normal(size=(cap, n))
    # noisy targets keep the winning hyperparameters in the
    # well-conditioned interior: near-singular candidates (huge length
    # scale + tiny jitter) have rounding-noise NLLs on which no two
    # factorization orders agree — the reference has the same property
    # (its K depends on its linear solver, see PARITY.md)
    D = (0.1 * np.sin(X.sum(axis=1))[:, None]
         + 0.05 * rng.normal(size=(cap, 1))) * np.ones((1, n))
    valid = np.zeros(cap)
    valid[:rows] = 1.0
    ds = Dataset(
        X=jnp.asarray(X * valid[:, None]),
        D=jnp.asarray(D * valid[:, None]),
        valid=jnp.asarray(valid),
    )
    # 1) the raw grid scoring agrees candidate-by-candidate (up to the
    # blocked factorization's different reduction order)
    grids = {}
    for lanes in (False, True):
        mdl = GParareal(n, N, optimizer="grid", score_lanes=lanes)
        fit_grid = mdl._get_fns(cap)[3]
        logs = mdl._grid_logs
        base = np.stack(
            np.meshgrid(logs, logs, indexing="ij"), -1
        ).reshape(-1, 2)
        T = n * len(mdl._jitters)
        g = jnp.asarray(np.broadcast_to(10.0 ** base, (T, base.shape[0], 2)))
        Ycols = jnp.asarray(np.repeat(np.asarray(ds.D).T,
                                      len(mdl._jitters), axis=0))
        jp = jnp.asarray(np.tile(mdl._jitters, n))
        th, fb = fit_grid(ds.X, Ycols, ds.valid, g, jp)
        grids[lanes] = (np.array(th), np.array(fb))
    np.testing.assert_allclose(grids[True][1], grids[False][1], rtol=1e-5)
    np.testing.assert_allclose(grids[True][0], grids[False][0], rtol=1e-12)

    # 2) the end-to-end fit lands in the same basin (refine may walk to a
    # slightly different near-tied optimum under the reordered arithmetic)
    fits = {}
    for lanes in (False, True):
        mdl = GParareal(n, N, optimizer="grid", score_lanes=lanes)
        mdl.fit(ds, k=7)  # rows bucket = cap
        fits[lanes] = (np.array(mdl.thetas), np.array(mdl.jitter_sel),
                       np.array(mdl.fvals))
    np.testing.assert_allclose(fits[True][2], fits[False][2], rtol=1e-3)
    np.testing.assert_allclose(fits[True][1], fits[False][1])
