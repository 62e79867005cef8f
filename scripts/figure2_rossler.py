"""Figure-2 equivalent: prediction-error study on Rossler.

Reference Figure_2.py:477-500 runs two Rossler studies through the
comp_mdls shadow harness and plots per-interval prediction error
(log10) for iterations k=5..7:

  1. bare parareal vs k-NN-mean models, nn in {1,2,3,4,5,10,15,30}
     -> img/rossler_pred_err_para
  2. GParareal vs nnGParareal with nn in {10,25,40}
     -> img/rossler_pred_err_gp

Here study 2's main model is the reference-exact scipy GP training path
(models/gp_scipy.py) and the nnGP shadows use the batched grid hyperopt.
Writes the figures + results/figure2_rossler.pkl.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MPLBACKEND", "Agg")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from nngparareal_tpu import Rossler, Config, RKSolver, Parareal
from nngparareal_tpu.utils import store_fig, store_pickle


def run_studies():
    ode = Rossler(normalization="-11")
    cfg = Config(ode).get()
    solver = RKSolver(
        ode.get_vector_field(), cfg["Ng"], cfg["Nf"], G=cfg["G"], F=cfg["F"]
    )

    p = Parareal(ode, solver, cfg["tspan"], cfg["N"], epsilon=5e-7,
                 verbose=None)
    knn_shadows = [
        ("knn_mean", {"nn": nn, "cstm_name": f"{nn}-NN"})
        for nn in (1, 2, 3, 4, 5, 10, 15, 30)
    ]
    res_nn = p.run(model="parareal", comp_models=knn_shadows, debug=True,
                   cstm_mdl_name="para_study")

    nngp_shadows = [
        ("nngp", {"nn": nn, "optimizer": "grid", "cstm_name": f"NNGP{nn}"})
        for nn in (10, 25, 40)
    ]
    res_gp = p.run(model="gpjax_scipy", comp_models=nngp_shadows, debug=True,
                   cstm_mdl_name="gp_study")
    return cfg["N"], res_nn, res_gp


def panels(N, main_label, main_errs, shadow_errs, fname, title):
    """Reference-style 3 panels for k=5,6,7 (indices 4..6): log10 mean
    per-interval prediction error across coordinates."""
    fig, axs = plt.subplots(1, 3, figsize=(10, 2.4), sharey=True)
    for i, k in enumerate(range(4, 7)):
        ax = axs[i]
        pe = main_errs[k]
        x = np.arange(pe.shape[0]) + (N - pe.shape[0])
        ax.plot(x, np.log10(pe.mean(axis=1)), ls=(0, (5, 10)), c="black",
                label=main_label)
        for nm, errs in shadow_errs.items():
            # shadow predictions have no finite-guard (the main model's
            # guard lives inside the sweep): a near-singular local Gram
            # can emit NaN for an interval — plot the finite coords
            se = np.where(np.isfinite(errs[k]), errs[k], np.nan)
            ax.plot(x, np.log10(np.nanmean(se, axis=1)), alpha=0.6,
                    label=nm)
        for y, c in ((-6, "gray"), (-8, "black"), (-10, "gray")):
            ax.axhline(y, ls="dashed", lw=1, color=c)
        ax.set_title(f"Rossler - k={k + 1}")
    fig.supxlabel("Interval $i$")
    fig.supylabel("log10 pred. error")
    axs[-1].legend(fontsize=6)
    fig.tight_layout()
    store_fig(fig, fname)
    print("stored", fname, flush=True)


def main():
    N, res_nn, res_gp = run_studies()
    payload = {
        "N": N,
        "para_err": res_nn["debug_dict"]["all_pred_err"],
        "para_shadows": res_nn["debug_dict"]["err_store_mdls"],
        "gp_err": res_gp["debug_dict"]["all_pred_err"],
        "gp_shadows": res_gp["debug_dict"]["err_store_mdls"],
        "K_para": res_nn["k"], "K_gp": res_gp["k"],
    }
    store_pickle(payload, "figure2_rossler.pkl", "results")

    sel = {k: v for k, v in payload["para_shadows"].items()
           if k in ("1-NN", "2-NN", "4-NN")}
    panels(N, "Para", payload["para_err"], sel, "rossler_pred_err_para",
           "parareal vs kNN-mean")
    panels(N, "GPara", payload["gp_err"], payload["gp_shadows"],
           "rossler_pred_err_gp", "GParareal vs nnGParareal")

    # summary numbers for PARITY.md
    for study, main_err, shadows in (
        ("para", payload["para_err"], sel),
        ("gp", payload["gp_err"], payload["gp_shadows"]),
    ):
        for k in range(4, 7):
            m = np.log10(main_err[k].mean())
            row = {}
            for nm, errs in shadows.items():
                se = np.where(np.isfinite(errs[k]), errs[k], np.nan)
                row[nm] = round(float(np.log10(np.nanmean(se))), 2)
            print(f"{study} k={k + 1}: main {m:.2f} shadows {row}", flush=True)


if __name__ == "__main__":
    main()
