"""Shadow comparison-model harness (reference Figure_2.py comp_mdls)."""

import numpy as np

from nngparareal_tpu import FHNODE, Config, RKSolver, Parareal


def test_comp_models_records_errors():
    ode = FHNODE(normalization="-11")
    cfg = Config(ode).get()
    solver = RKSolver(
        ode.get_vector_field(), cfg["Ng"], cfg["Nf"], G=cfg["G"], F=cfg["F"]
    )
    p = Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=5e-7,
                 verbose=None)
    out = p.run(
        model="parareal",
        early_stop=3,
        comp_models=[
            ("knn_mean", {"nn": 12}),
            ("nngp", {"nn": 12, "optimizer": "grid"}),
        ],
    )
    dd = out["debug_dict"]
    assert "err_store_mdls" in dd
    for nm, errs in dd["err_store_mdls"].items():
        assert len(errs) == 3
        assert all(np.all(np.isfinite(e)) for e in errs)
    # local-GP predictions should beat the naive k-NN mean on average
    knn_key = [k for k in dd["err_store_mdls"] if "kNN" in k or "knn" in k][0]
    gp_key = [k for k in dd["err_store_mdls"] if "NNGP" in k][0]
    knn_err = np.mean([e.mean() for e in dd["err_store_mdls"][knn_key][1:]])
    gp_err = np.mean([e.mean() for e in dd["err_store_mdls"][gp_key][1:]])
    assert gp_err < knn_err
