"""Precision-explicit blocked f32 Cholesky (ops/chol_blocked.py) and the
f32-scoring jitter floor (ops/gp.gp_nll rel_floor): the Hopf N=512
degenerate-theta fix (NOTES_ROUND5.md). CPU checks only — IEEE f32 here;
the on-chip A/B lives in scripts/dev/gp512_score_probe.py."""

import numpy as np
import scipy.linalg as sla
import jax.numpy as jnp
import pytest

from nngparareal_tpu.ops.chol_blocked import chol_diag_solve
from nngparareal_tpu.ops import gp as gpops


def _spd(m, seed=0, cond=1e4):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(m, m)))
    ev = np.logspace(0.0, -np.log10(cond), m)
    return (Q * ev) @ Q.T


@pytest.mark.parametrize("m", [64, 192, 300, 512])
def test_blocked_matches_lapack_f32(m):
    # 300 exercises the in-graph pad-to-block path (300 % 256 != 0)
    K = _spd(m, seed=m)
    K = K.astype(np.float32).astype(np.float64)  # f32-representable input
    y = np.random.default_rng(1).normal(size=m)
    L = np.linalg.cholesky(K)
    z = sla.solve_triangular(L, y, lower=True)
    d32, z32 = chol_diag_solve(
        jnp.asarray(K, jnp.float32), jnp.asarray(y, jnp.float32)
    )
    d32 = np.asarray(d32)[:m]
    z32 = np.asarray(z32)[:m]
    # cond 1e4 in f32: relative error ~ cond * eps32 ~ 1e-3
    assert np.allclose(d32, np.diag(L), rtol=5e-3)
    assert np.allclose(z32, z, rtol=2e-2, atol=5e-3 * np.abs(z).max())


def test_blocked_nan_on_indefinite():
    m = 128
    K = _spd(m, seed=3)
    K[0, 0] = -1.0  # not PSD
    d, z = chol_diag_solve(
        jnp.asarray(K, jnp.float32), jnp.ones((m,), jnp.float32)
    )
    assert not np.isfinite(np.asarray(d)).all()


def test_gp_nll_f32_blocked_matches_f64():
    # well-conditioned masked Gram: the f32 blocked NLL tracks the f64 one
    m, valid = 160, 130
    K = _spd(m, seed=7, cond=1e3)
    y = np.random.default_rng(2).normal(size=m)
    mask = np.zeros(m)
    mask[:valid] = 1.0
    nll64 = float(gpops.gp_nll(
        jnp.asarray(K), jnp.asarray(y), -8.0, jnp.asarray(mask)))
    nll32 = float(gpops.gp_nll(
        jnp.asarray(K, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.float32(-8.0), jnp.asarray(mask, jnp.float32)))
    assert np.isfinite(nll64) and np.isfinite(nll32)
    assert abs(nll32 - nll64) < 1e-3 * abs(nll64) + 1.0


def test_rel_floor_unlocks_rank_deficient():
    # SE Gram at a large length-scale over clustered points is numerically
    # rank-deficient: f32 at the reference's absolute jitter fails, the
    # Gershgorin-scaled relative floor factors it — this is exactly the
    # candidate class the on-chip f32 grid search was discarding
    rng = np.random.default_rng(0)
    X = rng.normal(size=(512, 3))
    sqd = ((X[:, None] - X[None, :]) ** 2).sum(-1)
    sx, sy = 30.0, 1e-3  # near-rank-1
    K = (sy ** 2) * np.exp(-0.5 * sqd / sx ** 2)
    y = rng.normal(size=512) * 1e-3
    mask = np.ones(512)
    args32 = (jnp.asarray(K, jnp.float32), jnp.asarray(y, jnp.float32),
              jnp.float32(-12.0), jnp.asarray(mask, jnp.float32))
    assert float(gpops.gp_nll(*args32)) == np.inf
    floored = float(gpops.gp_nll(
        *args32, rel_floor=4.0 * float(np.finfo(np.float32).eps)))
    assert np.isfinite(floored)


def test_grid_f32_single_jitter_picks_informative_theta():
    # end-to-end: grid fit with score_dtype=f32 must (a) run the collapsed
    # single-jitter task pool, (b) select a theta whose posterior actually
    # explains smooth data (the degenerate tiny-sx failure mode predicts
    # at the data's own std), (c) leave a validated (usable) posterior
    from nngparareal_tpu.models.base import Dataset
    from nngparareal_tpu.models.gp import GParareal

    rng = np.random.default_rng(5)
    cap, rows, n = 256, 200, 3
    X = rng.uniform(-1, 1, size=(rows, n))
    D = np.stack([np.sin(2.0 * X[:, 0]) * 1e-3,
                  (X[:, 1] ** 2) * 1e-3,
                  np.cos(X[:, 2]) * 1e-3], axis=1)
    Xp = np.zeros((cap, n)); Xp[:rows] = X
    Dp = np.zeros((cap, n)); Dp[:rows] = D
    V = np.zeros(cap); V[:rows] = 1.0
    ds = Dataset(jnp.asarray(Xp), jnp.asarray(Dp), jnp.asarray(V))

    mdl = GParareal(n, 32, optimizer="grid", score_dtype=jnp.float32)
    mdl.fit(ds, 1)
    assert mdl.alpha_unusable == []
    # posterior prediction at held-out points beats the degenerate
    # predict-zero baseline by a wide margin
    Xq = rng.uniform(-1, 1, size=(64, n))
    Dq = np.stack([np.sin(2.0 * Xq[:, 0]) * 1e-3,
                   (Xq[:, 1] ** 2) * 1e-3,
                   np.cos(Xq[:, 2]) * 1e-3], axis=1)
    th, jv, alpha = mdl.state
    sqd_q = ((X[None, :, :] - Xq[:, None, :]) ** 2).sum(-1)  # (64, rows)
    for c in range(n):
        Kq = (np.asarray(th)[c, 1] ** 2) * np.exp(
            -0.5 * sqd_q / np.asarray(th)[c, 0] ** 2)
        pred = Kq @ np.asarray(alpha)[c, :rows]
        err = np.abs(pred - Dq[:, c]).max()
        # degenerate-theta failure mode predicts ~0 (err ~ 1x std);
        # an informative posterior sits an order of magnitude below
        assert err < 0.15 * np.abs(Dq[:, c]).std(), (c, err)


def test_fit_rows_cap_windows_newest_rows():
    # beyond fit_rows_cap the GP trains on the newest valid rows only and
    # scatters alpha back to their true dataset positions (the >16384
    # toolchain-buffer-cliff mitigation, see GParareal.__init__)
    from nngparareal_tpu.models.base import Dataset
    from nngparareal_tpu.models.gp import GParareal

    rng = np.random.default_rng(9)
    cap, N, n = 512, 16, 2
    X = rng.uniform(-1, 1, size=(cap, n))
    D = np.stack([np.sin(2 * X[:, 0]) * 1e-3, X[:, 1] ** 2 * 1e-3], 1)
    V = np.ones(cap)
    V[100:110] = 0.0  # a hole: invalid rows mid-dataset
    ds = Dataset(jnp.asarray(X), jnp.asarray(D), jnp.asarray(V))

    mdl = GParareal(n, N, optimizer="grid", fit_rows_cap=256)
    k = cap // N - 1  # rows = (k+1)*N = 512 > 256 -> window engages
    mdl.fit(ds, k)
    alpha = np.asarray(mdl.state[2])
    newest_valid = np.where(V > 0)[0][-256:]
    outside = np.setdiff1d(np.arange(cap), newest_valid)
    assert np.abs(alpha[:, outside]).max() == 0.0
    assert np.abs(alpha[:, newest_valid]).max() > 0.0
    # and the windowed posterior still explains the smooth data
    Xq = rng.uniform(-1, 1, size=(32, n))
    Dq = np.stack([np.sin(2 * Xq[:, 0]) * 1e-3, Xq[:, 1] ** 2 * 1e-3], 1)
    th = np.asarray(mdl.state[0])
    sqd_q = ((X[None, :, :] - Xq[:, None, :]) ** 2).sum(-1)
    for c in range(n):
        Kq = (th[c, 1] ** 2) * np.exp(-0.5 * sqd_q / th[c, 0] ** 2)
        pred = Kq @ alpha[c]
        assert np.abs(pred - Dq[:, c]).max() < 0.2 * np.abs(Dq[:, c]).std()


def test_score_rows_cap_posterior_quality():
    # scoring-window cap: theta selection on the newest score_rows_cap
    # valid rows, alphas on the FULL fit window (GParareal.__init__
    # score_rows_cap notes). The selected theta may differ from the
    # full-window winner on flat NLL landscapes — the contract is that
    # the resulting FULL-window posterior is validated-usable and
    # predicts held-out data as well as the full-window-scored fit.
    from nngparareal_tpu.models.base import Dataset
    from nngparareal_tpu.models.gp import GParareal

    rng = np.random.default_rng(11)
    cap, N, n = 512, 16, 2
    X = rng.uniform(-1, 1, size=(cap, n))
    D = np.stack([np.sin(2 * X[:, 0]) * 1e-3, X[:, 1] ** 2 * 1e-3], 1)
    V = np.ones(cap)
    ds = Dataset(jnp.asarray(X), jnp.asarray(D), jnp.asarray(V))
    k = cap // N - 1  # rows = 512

    Xq = rng.uniform(-1, 1, size=(64, n))
    Dq = np.stack([np.sin(2 * Xq[:, 0]) * 1e-3, Xq[:, 1] ** 2 * 1e-3], 1)
    sqd_q = ((Xq[:, None, :] - X[None, :, :]) ** 2).sum(-1)  # (64, cap)

    def holdout_err(mdl):
        th, _, alpha = (np.asarray(a) for a in mdl.state)
        errs = []
        for c in range(n):
            Kq = (th[c, 1] ** 2) * np.exp(-0.5 * sqd_q / th[c, 0] ** 2)
            pred = Kq @ alpha[c]
            errs.append(np.abs(pred - Dq[:, c]).max())
        return np.array(errs)

    m_full = GParareal(n, N, optimizer="grid", score_rows_cap=None)
    m_full.fit(ds, k)
    m_win = GParareal(n, N, optimizer="grid", score_rows_cap=128)
    m_win.fit(ds, k)

    assert m_win.alpha_unusable == []
    # alphas from the windowed-score fit still span the full dataset
    alpha = np.asarray(m_win.state[2])
    assert (np.abs(alpha) > 0).sum() > 128 * n  # not just the score window
    # windowed-score posterior predicts held-out data comparably (each
    # coordinate within 3x of the full-window-scored error, and far
    # below the degenerate predict-zero baseline ~ data std)
    e_full, e_win = holdout_err(m_full), holdout_err(m_win)
    for c in range(n):
        base = np.abs(Dq[:, c]).std()
        assert e_win[c] < max(3.0 * e_full[c], 0.2 * base), (
            c, e_win[c], e_full[c], base)
