"""ScipySolver validation path (reference solver.py:116-148)."""

import os

import numpy as np
import pytest

from nngparareal_tpu import FHNODE, ScipySolver, RKSolver, Parareal

RUN_SLOW = os.environ.get("RUN_SLOW", "0") == "1"


def test_scipy_fine_matches_rk():
    ode = FHNODE(normalization="-11")
    f = ode.get_vector_field()
    rk = RKSolver(f, 4, 1500, G="RK2", F="RK4")
    # scipy tolerance only needs to sit well under the 1e-7 assert below;
    # 1e-9 halves the adaptive RK23 step count vs 1e-10 (suite wall)
    sp = ScipySolver(f, 4, 1500, G="RK2", F="RK4", rtol=1e-9, atol=1e-11)
    u0 = ode.get_init_cond()
    a = np.asarray(rk.run_F(0.0, 1.0, u0))
    b = np.asarray(sp.run_F(0.0, 1.0, u0))
    np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-9)
    # coarse delegates to the RK implementation
    np.testing.assert_allclose(
        np.asarray(sp.run_G(0.0, 1.0, u0)), np.asarray(rk.run_G(0.0, 1.0, u0))
    )


@pytest.mark.skipif(not RUN_SLOW, reason="scipy fine solves via python callbacks are minutes on CPU")
def test_parareal_with_scipy_solver():
    """Mini parareal run with the adaptive scipy fine solver (the
    reference's SolverScipy CPU validation path, solver.py:116-148).
    Small span: each scipy fine solve goes through a python-callback
    vector field, so the full paper config would take minutes."""
    ode = FHNODE(normalization="-11")
    f = ode.get_vector_field()
    sp = ScipySolver(f, 4, 400, G="RK2", F="RK4")
    p = Parareal(ode, sp, [0, 8], 8, epsilon=5e-7, verbose=None)
    out = p.run(model="parareal", measure_serial_fine=False, warmup=False)
    assert out["converged"]
    assert out["k"] <= 8
