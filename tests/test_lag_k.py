"""lag_k windowed training (reference new_lib.py:980-987)."""

import numpy as np
import jax.numpy as jnp

from nngparareal_tpu import FHNODE, Config, RKSolver, Parareal
from nngparareal_tpu.driver import Parareal as P


def test_windowed_valid_mask():
    N = 4
    cap = 3 * N
    valid = jnp.ones(cap)
    # k=2, I=1, lag_k=2 -> keep iterations {1, 2}, slices >= 1
    got = np.asarray(P._windowed_valid(valid, N, k=2, I=1, lag_k=2))
    want = np.zeros(cap)
    for kk in (1, 2):
        for i in range(1, N):
            want[kk * N + i] = 1.0
    np.testing.assert_array_equal(got, want)


def test_lag_k_run_converges():
    ode = FHNODE(normalization="-11")
    cfg = Config(ode).get()
    solver = RKSolver(
        ode.get_vector_field(), cfg["Ng"], cfg["Nf"], G=cfg["G"], F=cfg["F"]
    )
    p = Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=5e-7, verbose=None)
    out = p.run(model="nngp", nn=15, lag_k=3)
    assert out["converged"]
    assert out["k"] <= 11  # must still beat bare parareal
