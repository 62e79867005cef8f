"""End-to-end parareal runs: the published iterations-to-convergence K are
the acceptance oracle (SURVEY.md section 6.1, BASELINE.md section 1).

FHN ODE, N=40, RK2/RK4, [-1,1]-normalized, epsilon=5e-7:
    K(Parareal)=11, K(GParareal)=5, K(nnGParareal, m=15)=5.
"""

import os

import numpy as np
import pytest

from nngparareal_tpu import FHNODE, Config, RKSolver, Parareal, PararealLight


RUN_SLOW = os.environ.get("RUN_SLOW", "0") == "1"


def _fhn_parareal(epsilon=5e-7, **kw):
    ode = FHNODE(normalization="-11")
    cfg = Config(ode).get()
    solver = RKSolver(
        ode.get_vector_field(), cfg["Ng"], cfg["Nf"], G=cfg["G"], F=cfg["F"]
    )
    return Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=epsilon,
                    verbose=None, **kw)


def test_fhn_bare_parareal_k11():
    p = _fhn_parareal()
    out = p.run(model="parareal")
    assert out["converged"]
    assert out["k"] == 11  # BASELINE.md Table 1, FHN / Parareal / 5e-7


def test_fhn_bare_parareal_eps5em9_k14():
    p = _fhn_parareal(epsilon=5e-9)
    out = p.run(model="parareal")
    assert out["converged"]
    assert out["k"] == 14  # BASELINE.md Table 1, FHN / Parareal / 5e-9


def test_fhn_nngp_k5():
    p = _fhn_parareal()
    out = p.run(model="nngp", nn=15)
    assert out["converged"]
    assert out["k"] == 5  # BASELINE.md Table 1, FHN / nnGParareal / 5e-7
    # dataset bookkeeping: x/D row counts follow sum_k (N - I_k + 1)
    assert out["x"].shape == out["D"].shape
    assert out["x"].shape[0] > 0


@pytest.mark.skipif(not RUN_SLOW, reason="full-GP NM is minutes on CPU (set RUN_SLOW=1)")
def test_fhn_gparareal_k5():
    p = _fhn_parareal()
    out = p.run(model="gpjax", fatol=1e-6, xatol=1e-6)
    assert out["converged"]
    assert out["k"] == 5  # BASELINE.md Table 1, FHN / GParareal / 5e-7


@pytest.mark.skipif(not RUN_SLOW, reason="~45s on CPU (set RUN_SLOW=1)")
def test_fhn_gparareal_grid_k5():
    """The NM-free dense-grid hyperopt (the TPU GParareal path; see
    models/gp.py) reproduces the published K on the end-to-end run."""
    p = _fhn_parareal()
    out = p.run(model="gpjax", optimizer="grid")
    assert out["converged"]
    assert out["k"] == 5


def test_fhn_elm_converges():
    p = _fhn_parareal()
    out = p.run(model="elm", m=10, res_size=20)
    # exploratory corrector (reference models.py:476-554): no published K;
    # just require convergence well before the trivial bound K=N
    assert out["converged"]
    assert out["k"] < p.N


def test_final_solution_matches_serial_fine():
    """Converged parareal endpoints must agree with one serial fine solve."""
    p = _fhn_parareal()
    out = p.run(model="parareal")
    t = out["t"]
    u_serial = np.asarray(p.solver.run_F(t[0], t[-1], p.u0))
    np.testing.assert_allclose(out["u"][-1], u_serial, atol=2e-5)


def test_parareal_light_and_history():
    p = _fhn_parareal()
    out = p.run(model="parareal", keep_history=True)
    assert out["u_hist"].shape[2] == out["k"] + 1
    pl = _fhn_parareal()
    pl_light = PararealLight(pl.ode, pl.solver, pl.tspan, pl.N, pl.epsilon,
                             verbose=None)
    out2 = pl_light.run(model="parareal")
    assert out2["k"] == out["k"]
    np.testing.assert_allclose(out2["u"], out["u"], rtol=1e-12)


def test_early_stop():
    p = _fhn_parareal()
    out = p.run(model="parareal", early_stop=3)
    assert out["k"] == 3 and not out["converged"]


def test_debug_mode_records_model_errors():
    p = _fhn_parareal()
    out = p.run(model="parareal", debug=True, early_stop=3)
    dd = out["debug_dict"]
    assert len(dd["all_pred_err"]) == 3
    assert dd["one_step_error"].shape[1] == 2


def test_checkpoint_resume_identical(tmp_path):
    p1 = _fhn_parareal()
    out_full = p1.run(model="parareal")

    p2 = _fhn_parareal()
    p2.run(model="parareal", store_int=True, int_dir=str(tmp_path), early_stop=4)
    ckpt_dir = os.path.join(str(tmp_path), f"{p2.ode_name}_{p2.N}_Parareal_int")
    ckpts = sorted(os.listdir(ckpt_dir), key=lambda s: int(s.rsplit("_", 1)[-1]))
    ckpt = os.path.join(ckpt_dir, ckpts[-1])

    p3 = _fhn_parareal()
    out_resumed = p3.load_int_dump(ckpt, model="parareal")
    assert out_resumed["k"] == out_full["k"]
    assert out_resumed["converged"]
    np.testing.assert_allclose(out_resumed["u"], out_full["u"], rtol=1e-12)


def test_reporting_tables():
    p = _fhn_parareal()
    p.run(model="parareal")
    txt = p.print_times()
    assert "Speedup" in txt and "Parareal" in txt
    txt2 = p.print_speedup()
    assert "Speed-up" in txt2
    txt3 = p.print_speedup(md=False)
    assert "tabular" in txt3


def test_nngp_scipy_oracle_smoke():
    """The host-only scipy-NM oracle (models/nngp_scipy.py) plugs into the
    driver's non-jitted python sweep and makes normal progress."""
    p = _fhn_parareal()
    out = p.run(model="nngp_scipy", nn=15, early_stop=1)
    assert out["k"] == 1 and np.isfinite(out["err"]).all()


@pytest.mark.skipif(not RUN_SLOW, reason="scipy NM per task is minutes on CPU")
def test_fhn_nngp_scipy_oracle_k5():
    p = _fhn_parareal()
    out = p.run(model="nngp_scipy", nn=15)
    assert out["converged"]
    assert out["k"] == 5  # BASELINE.md Table 1, FHN / nnGParareal / 5e-7


@pytest.mark.skipif(not RUN_SLOW, reason="scipy NM per task is minutes on CPU")
def test_hopf_nngp_scipy_oracle_k9():
    """Reference-parity oracle reproduces the published Hopf-32 K exactly
    (reference Table 2: nnGParareal K=9 at eps=5e-7), validating the whole
    data pipeline — the batched-optimizer gap is isolated to theta search."""
    from nngparareal_tpu import Hopf

    ode = Hopf(normalization="-11")
    cfg = Config(ode, N=32).get()
    solver = RKSolver(ode.get_vector_field(), cfg["Ng"], cfg["Nf"],
                      G=cfg["G"], F=cfg["F"])
    p = Parareal(ode, solver, cfg["tspan"], 32, epsilon=5e-7, verbose=None)
    out = p.run(model="nngp_scipy", nn=15)
    assert out["converged"]
    assert out["k"] == 9
