"""Posterior-solve validation for the full GP (GParareal).

Round-4 regression: on Hopf N=512 the grid hyperopt (f32 scoring)
selected a theta whose 11.8k-point Gram is numerically indefinite in
IEEE f64 — jnp.linalg.cholesky returned NaN alphas, every prediction
tripped the driver's finite-guard fallback (driver.py:348-354), and the
run silently crawled as bare Parareal (+3 converged intervals/iter for
10 iterations). ``GParareal._validate_alphas`` now residual-checks the
final alpha fit and walks to the next usable (theta, jitter); these
tests pin that contract. Reference equivalent: the NM rescue loop
(models.py:358-384) re-rolls theta until the NLL is finite — but it
never cross-checks scoring arithmetic against the final solve, which is
the failure mode here.
"""

import numpy as np
import jax.numpy as jnp

from nngparareal_tpu.models.base import Dataset
from nngparareal_tpu.models.gp import GParareal


def _dup_ds(n=2, rows=24, cap=32, seed=7):
    """Dataset with exactly duplicated inputs: any kernel with a
    lengthscale much larger than the point spread is rank-deficient."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(cap, n))
    X[rows // 2:rows] = X[: rows - rows // 2][: rows // 2]  # duplicates
    D = np.tanh(X @ rng.normal(size=(n, n))) * 0.1
    X[rows:] = 0.0
    D[rows:] = 0.0
    valid = np.zeros(cap)
    valid[:rows] = 1.0
    return Dataset(X=jnp.asarray(X), D=jnp.asarray(D), valid=jnp.asarray(valid))


def _resid(mdl, ds):
    """Relative residual of the fitted posterior on the valid block."""
    th, jv, alpha = mdl.state
    X = np.asarray(ds.X)
    V = np.asarray(ds.valid)
    out = []
    for c in range(mdl.n):
        sx, sy = np.asarray(th)[c]
        sq = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        K = (sy**2) * np.exp(-0.5 * sq / (sx**2))
        Kj = K * (V[:, None] * V[None, :]) + np.diag(1.0 - V)
        Kj += (10.0 ** float(np.asarray(jv)[c])) * np.eye(len(V))
        ym = np.asarray(ds.D)[:, c] * V
        r = Kj @ np.asarray(alpha)[c][: len(V)] - ym
        out.append(np.linalg.norm(r) / max(np.linalg.norm(ym), 1e-300))
    return np.array(out)


def test_validate_swaps_to_usable_candidate():
    """A hand-built failing top pick must be replaced by the ranked
    candidate walk, and the returned alpha must satisfy the residual
    contract."""
    ds = _dup_ds()
    mdl = GParareal(2, 9, optimizer="grid")
    B = 32
    fns = mdl._get_fns(B)
    alphas, alpha_resid = fns[1], fns[4]

    # top pick: enormous lengthscale + sub-eps jitter -> rank-1 Gram,
    # cholesky fails in f64; rank-1 candidate table holds a sane fallback
    th = np.array([[1e6, 1.0], [1e6, 1.0]])
    jv = np.array([-20.0, -20.0])
    fv = np.zeros(2)
    alpha = alphas(ds.X, ds.D, ds.valid, jnp.asarray(th), jnp.asarray(jv))
    assert not np.isfinite(np.asarray(alpha)).all()  # the hazard is real

    nj = len(mdl._jitters)
    th_nj = np.tile(np.array([1.0, 0.1]), (2, nj, 1))
    fv_nj = np.tile(np.arange(1.0, nj + 1.0), (2, 1))  # rank order 0..nj-1
    fv_nj[:, 0] = 0.0  # rank-0 = the failing pick above
    th_nj[:, 0] = th
    th2, jv2, fv2, alpha2 = mdl._validate_alphas(
        alphas, alpha_resid, ds.X, ds.D, ds.valid,
        th.copy(), jv.copy(), fv.copy(), alpha, (th_nj, fv_nj))

    assert np.isfinite(np.asarray(alpha2)).all()
    assert mdl.alpha_rejects, "audit trail must record the rejection"
    np.testing.assert_allclose(th2, np.tile([1.0, 0.1], (2, 1)))
    rel = np.asarray(alpha_resid(ds.X, ds.D, ds.valid, jnp.asarray(th2),
                                 jnp.asarray(jv2), alpha2))
    assert (rel < mdl.alpha_res_tol).all(), rel


def test_validate_escalates_jitter_without_candidates():
    """NM path (no candidate table): jitter escalation alone must rescue
    a singular Gram."""
    ds = _dup_ds()
    mdl = GParareal(2, 9, optimizer="grid")
    fns = mdl._get_fns(32)
    alphas, alpha_resid = fns[1], fns[4]
    th = np.array([[1e6, 1.0], [1e6, 1.0]])
    jv = np.array([-20.0, -20.0])
    alpha = alphas(ds.X, ds.D, ds.valid, jnp.asarray(th), jnp.asarray(jv))
    th2, jv2, _, alpha2 = mdl._validate_alphas(
        alphas, alpha_resid, ds.X, ds.D, ds.valid,
        th.copy(), jv.copy(), np.zeros(2), alpha, None)
    assert np.isfinite(np.asarray(alpha2)).all()
    assert (jv2 > jv).all()  # escalated past the selection ceiling


def test_warmup_fit_is_silent(capsys):
    """A fit against an all-invalid dataset (the driver's warmup/compile
    fit, driver.py:697-704) must skip posterior validation entirely: the
    masked Gram is the identity and y is all-zero, so the residual check
    is vacuous and the unusable-posterior warning on it is pure noise —
    it cost real chip time in round 4 when queue guards keyed on it."""
    n, cap = 2, 32
    ds = Dataset(X=jnp.zeros((cap, n)), D=jnp.zeros((cap, n)),
                 valid=jnp.zeros(cap))
    mdl = GParareal(n, 9, optimizer="grid")
    mdl.fit(ds, 0)
    out = capsys.readouterr().out
    assert "posterior solve unusable" not in out
    assert not mdl.alpha_unusable
    _, _, alpha = mdl.state
    assert np.isfinite(np.asarray(alpha)).all()


def test_unusable_fit_is_counted_and_stamped(capsys):
    """When the walk exhausts, the warning must carry k= and the valid
    row count, and the failure must land in alpha_unusable/get_times so
    guards can key on data instead of log greps."""
    ds = _dup_ds()
    mdl = GParareal(2, 9, optimizer="grid")
    mdl.k = 3
    fns = mdl._get_fns(32)
    alphas, alpha_resid = fns[1], fns[4]
    th = np.array([[1e6, 1.0], [1e6, 1.0]])
    jv = np.array([-20.0, -20.0])
    alpha = alphas(ds.X, ds.D, ds.valid, jnp.asarray(th), jnp.asarray(jv))
    # impossible tolerance: every solve "fails", the walk exhausts
    mdl.alpha_res_tol = 1e-300
    mdl._validate_alphas(alphas, alpha_resid, ds.X, ds.D, ds.valid,
                         th.copy(), jv.copy(), np.zeros(2), alpha, None,
                         n_valid=24)
    out = capsys.readouterr().out
    assert "k=3" in out and "24 valid rows" in out
    assert len(mdl.alpha_unusable) == 1
    assert mdl.get_times()["alpha_unusable"] == 1
    assert mdl.alpha_unusable[0]["n_valid"] == 24


def test_jitter_escalation_is_per_coordinate():
    """A coordinate that reaches the jitter cap must not end escalation
    for coords still below it (round-4 advisor finding): start coord 0
    at the cap and coord 1 at the floor — coord 1 must still be rescued."""
    ds = _dup_ds()
    mdl = GParareal(2, 9, optimizer="grid")
    fns = mdl._get_fns(32)
    alphas, alpha_resid = fns[1], fns[4]
    th = np.array([[1e6, 1.0], [1e6, 1.0]])
    jv = np.array([-4.0, -20.0])  # coord 0 already at jit_cap
    alpha = alphas(ds.X, ds.D, ds.valid, jnp.asarray(th), jnp.asarray(jv))
    _, jv2, _, alpha2 = mdl._validate_alphas(
        alphas, alpha_resid, ds.X, ds.D, ds.valid,
        th.copy(), jv.copy(), np.zeros(2), alpha, None, n_valid=24)
    # coord 1 escalated (possibly to usability); with the pre-fix
    # np.all() gate the loop exited immediately and jv2[1] stayed -20
    assert jv2[1] > -20.0


def test_fit_posterior_always_usable_on_degenerate_data():
    """End-to-end: fit() on a duplicated-point dataset must hand the
    sweep a finite, residual-valid posterior whatever theta the scoring
    picked."""
    ds = _dup_ds()
    for opt in ("grid", "nm"):
        mdl = GParareal(2, 9, optimizer=opt)
        mdl.fit(ds, 0)
        _, _, alpha = mdl.state
        assert np.isfinite(np.asarray(alpha)).all()
        rel = _resid(mdl, ds)
        assert (rel < mdl.alpha_res_tol).all(), (opt, rel)
