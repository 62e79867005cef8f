"""Research variants: neighbour strategies (NNGP_alt) and NNGPtime."""

import numpy as np
import pytest

from nngparareal_tpu import FHNODE, Config, RKSolver, Parareal


def _fhn(epsilon=5e-7):
    ode = FHNODE(normalization="-11")
    cfg = Config(ode).get()
    solver = RKSolver(
        ode.get_vector_field(), cfg["Ng"], cfg["Nf"], G=cfg["G"], F=cfg["F"]
    )
    return Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=epsilon,
                    verbose=None)


@pytest.mark.parametrize("strategy", ["col_only", "col+rnd", "row_col",
                                      "row", "col_full"])
def test_neighbor_strategies_run(strategy):
    p = _fhn()
    # grid optimizer: deterministic, no inner NM loop -> fast CPU trace
    out = p.run(model="nngp", nn=12, strategy=strategy, early_stop=2,
                optimizer="grid", grid_refine=0)
    assert out["k"] == 2
    assert np.all(np.isfinite(out["u"]))


def test_nngp_time_converges():
    p = _fhn()
    out = p.run(model="nngp_time", nn=10, reps=2, nn_iters=2,
                nm_max_iters=40, early_stop=2)
    assert out["k"] == 2
    assert np.all(np.isfinite(out["u"]))


import os

RUN_SLOW = os.environ.get("RUN_SLOW", "0") == "1"


@pytest.mark.skipif(not RUN_SLOW, reason="full Lorenz convergence is minutes on CPU")
def test_nngp_time_lorenz_full_convergence():
    """The time-augmented variant on the system the reference analyzes it
    on (nnGPara_with_time.py:671-729, Lorenz): must converge well before
    bare Parareal's K=15 and in the neighbourhood of plain nnGP's K=9."""
    from nngparareal_tpu import Lorenz

    ode = Lorenz(normalization="-11")
    cfg = Config(ode).get()
    solver = RKSolver(ode.get_vector_field(), cfg["Ng"], cfg["Nf"],
                      G=cfg["G"], F=cfg["F"])
    p = Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=5e-7,
                 verbose=None)
    # bounded config: the full reps=3 x nn_iters=3 run is hours on one
    # CPU core (the refinement chains recompile huge fixed-NM graphs at
    # every capacity doubling); reps=2 x nn_iters=2 converges the same
    # way and keeps the gate to minutes. The full-config validation run
    # is recorded in PARITY.md (TPU).
    out = p.run(model="nngp_time", nn=14, reps=2, nn_iters=2,
                nm_max_iters=80)
    assert out["converged"]
    assert out["k"] < 15  # beats bare Parareal
    assert out["k"] <= 13  # within the nnGP family's documented range
