"""GParareal dense-grid hyperopt (optimizer='grid').

The NM-free theta selection is the TPU path for the full GP: on the axon
TPU toolchain the second distinct batched-NM executable in a process
kernel-faults (scripts/dev/gp_crash_probe.py fitseq bisect), while the
plain batched-Cholesky-NLL grid program runs reliably at every dataset
capacity. These tests pin (a) the grid search finds the same NLL basin
as batched NM on a well-conditioned dataset, and (b) the deterministic /
seed-free contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nngparareal_tpu.models.base import Dataset
from nngparareal_tpu.models.gp import GParareal


def _ds(n=2, rows=24, cap=32, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(cap, n))
    # smooth function of X: a GP with moderate length scale fits well
    D = np.tanh(X @ rng.normal(size=(n, n))) * 0.1
    X[rows:] = 0.0
    D[rows:] = 0.0
    valid = np.zeros(cap)
    valid[:rows] = 1.0
    return Dataset(X=jnp.asarray(X), D=jnp.asarray(D), valid=jnp.asarray(valid))


def test_grid_matches_nm_nll_basin():
    ds = _ds()
    m_nm = GParareal(2, 9, fatol=1e-6, xatol=1e-6)
    m_gr = GParareal(2, 9, optimizer="grid")
    m_nm.fit(ds, 0)
    m_gr.fit(ds, 0)
    # the dense grid + refine must land at-or-below NM's NLL within the
    # refine resolution on every coordinate (it cannot be stuck worse)
    assert np.all(m_gr.fvals <= m_nm.fvals + 0.5), (m_gr.fvals, m_nm.fvals)
    assert np.isfinite(m_gr.fvals).all()
    assert np.all(np.isin(m_gr.jitter_sel, m_gr._jitters))


def test_grid_is_deterministic_and_seed_free():
    ds = _ds()
    a = GParareal(2, 9, optimizer="grid", seed=1)
    b = GParareal(2, 9, optimizer="grid", seed=99)
    a.fit(ds, 0)
    b.fit(ds, 0)
    np.testing.assert_array_equal(a.thetas, b.thetas)
    np.testing.assert_array_equal(a.fvals, b.fvals)


def test_grid_predicts_like_nm():
    ds = _ds()
    m_nm = GParareal(2, 9, fatol=1e-6, xatol=1e-6)
    m_gr = GParareal(2, 9, optimizer="grid")
    m_nm.fit(ds, 0)
    m_gr.fit(ds, 0)
    q = jnp.asarray(np.random.default_rng(5).normal(size=(2,)))
    zero = jnp.zeros(2)
    p_nm = np.asarray(
        m_nm.predict_fn(m_nm.state_pytree(), ds, q, zero, zero, None, 0))
    p_gr = np.asarray(
        m_gr.predict_fn(m_gr.state_pytree(), ds, q, zero, zero, None, 0))
    # same posterior family, near-identical hyperparameters -> predictions
    # agree to the scale of the defects (0.1)
    np.testing.assert_allclose(p_gr, p_nm, atol=2e-2)
