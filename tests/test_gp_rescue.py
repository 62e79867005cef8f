"""The GParareal +inf rescue path (reference models.py:358-384).

Round-1 verdict flagged a latent NameError in the retry branch; these
tests force both the successful rescue and the exhaustion error."""

import numpy as np
import jax.numpy as jnp
import pytest

from nngparareal_tpu.models.base import Dataset
from nngparareal_tpu.models.gp import GParareal


def _make(n=2, N=9, rows=12, cap=16, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(cap, n))
    D = 0.1 * rng.normal(size=(cap, n))
    valid = np.zeros(cap)
    valid[:rows] = 1.0
    ds = Dataset(X=jnp.asarray(X), D=jnp.asarray(D), valid=jnp.asarray(valid))
    return GParareal(n, N), ds


def test_rescue_replaces_inf_coord():
    mdl, ds = _make()
    th = np.tile(mdl.theta0, (mdl.n, 1))
    jv = np.full(mdl.n, -20.0)
    fv = np.array([np.inf, 1.0])
    th2, jv2, fv2 = mdl._rescue(
        ds.X, ds.D, ds.valid, th.copy(), jv.copy(), fv.copy(), np.array([0])
    )
    assert np.isfinite(fv2).all()
    assert np.all(np.isfinite(th2))
    # untouched coordinate keeps its values
    assert fv2[1] == 1.0 and jv2[1] == -20.0
    # rescued jitter comes from the reference's 10^{-20..-12} grid
    assert jv2[0] in mdl._jitters


def test_rescue_exhaustion_raises():
    mdl, ds = _make()
    th = np.tile(mdl.theta0, (mdl.n, 1))
    jv = np.full(mdl.n, -20.0)
    fv = np.array([np.inf, 1.0])
    with pytest.raises(RuntimeError, match="rescue failed"):
        mdl._rescue(
            ds.X, ds.D, ds.valid, th, jv, fv, np.array([0]), max_attempts=0
        )
