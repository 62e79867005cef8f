"""Speedup-analysis figures — the reference README's two headline images.

Reference: `Hopf.py:183-373` (img/nonaut_scal_speedup.png) and
`FHN_PDE.py:289-482` (img/fhn_pde_speedup_upd.png): per-N (resp. per-dx)
curves of the empirical speedup Ŝ = est_serial/runtime for Parareal /
GParareal / nnGParareal, with the algorithmic upper bound S* = N/K.

This renders the TPU-framework analogue from OUR stored runs
(results/hopf_*.pkl, results/fhn_pde_*.pkl, plus any on-chip rows in
results/resumable_runs.json) overlaid on the reference's published curves
(BASELINE.md sections 2/5) so the two hardware baselines can be compared
at a glance:

- dashed  = reference empirical Ŝ on its SLURM cluster (~N cores),
- solid   = ours on ONE TPU chip,
- dotted  = ours' algorithmic upper bound S* = N/K,
- right panel = end-to-end runtime (same problem, same tolerance): the
  single-chip wall beats the cluster wall even where the classic Ŝ is
  structurally smaller (one chip runs every slice's fine solve itself).

Run on CPU (reads pickles only): python scripts/speedup_plots.py
"""

import json
import os
import pickle
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nngparareal_tpu.utils.io import store_fig

RES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results")

# model -> color: Okabe-Ito colorblind-safe hues, keeping the reference's
# semantic assignment (Hopf.py:249: para gray / gp red / nngp blue)
C = {"para": "#848484", "gp": "#D55E00", "nngp": "#0072B2"}
LBL = {"para": "Parareal", "gp": "GParareal", "nngp": "nnGParareal"}

# Reference published values (BASELINE.md section 2, nonaut_scal_final)
REF_HOPF = {
    "N": [32, 64, 128, 256, 512],
    "S": {
        "para": [1.67, 2.11, 2.35, 2.13, 3.38],
        "gp": [3.18, 4.48, 7.18, 6.02, 1.70],
        "nngp": [3.54, 5.76, 9.66, 16.41, 21.17],
    },
    "runtime": {
        "para": [2.076e4, 1.651e4, 1.467e4, 1.898e4, 1.016e4],
        "gp": [1.093e4, 7.784e3, 4.794e3, 5.715e3, 2.012e4],
        "nngp": [9.804e3, 6.064e3, 3.565e3, 2.279e3, 1.616e3],
    },
}

# Reference published values (BASELINE.md section 5, FHN_scal_times), N=512
REF_FHN = {
    "dx": [10, 12, 14, 16],
    "S": {
        "para": [19.87, 7.54, 10.53, 4.97],
        "gp": [1.75, 5.34, np.nan, np.nan],  # DNF at dx>=14
        "nngp": [16.05, 22.85, 44.73, 45.59],
    },
    "runtime": {
        "para": [5.135e3, 2.386e4, 2.726e4, 1.651e5],
        "gp": [5.801e4, 3.350e4, np.nan, np.nan],
        "nngp": [6.308e3, 7.800e3, 6.395e3, 1.785e4],
    },
}


def _load_rows(pattern, xs):
    """rows[x] = list of run dicts from results/<pattern % x>.pkl."""
    rows = {}
    for x in xs:
        path = os.path.join(RES, pattern % x)
        if not os.path.exists(path):
            continue
        with open(path, "rb") as fh:
            rows[x] = pickle.load(fh)
    return rows


def _resumable_rows(system_prefix, model):
    """On-chip rows from run_resumable (results/resumable_runs.json):
    converged axon-backend runs for e.g. the queued Hopf GP scaling rows."""
    path = os.path.join(RES, "resumable_runs.json")
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        recs = json.load(fh)
    out = {}
    for r in recs:
        # run_resumable records the chip backend as "tpu" (older rows:
        # "axon"); CPU validation rows are excluded from the on-chip plot
        if (r.get("backend") in ("tpu", "axon") and r.get("converged")
                and r.get("model") == model
                and str(r.get("system", "")).startswith(system_prefix)):
            N = int(r["N"])
            t = r["timings"]
            serial = t["F_time_serial_avg"] / max(r["K"], 1) * N
            out[N] = {
                "k": r["K"],
                "speedup": serial / t["runtime"],
                "runtime": t["runtime"],
            }
    return out


def _ours_series(rows, name):
    """(xs, K, S, runtime) for run-name `name` out of the per-x row lists."""
    xs, K, S, rt = [], [], [], []
    for x in sorted(rows):
        for r in rows[x]:
            if r.get("name") == name and "speedup" in r:
                xs.append(x)
                K.append(r["k"])
                S.append(r["speedup"])
                rt.append(r["runtime"])
                break
    return xs, K, S, rt


def _panel(ax_s, ax_t, xticks, ref, ours, ub, xlabel):
    for m in ("para", "gp", "nngp"):
        ax_s.plot(ref["x"], ref["S"][m], ls="--", c=C[m], lw=1.6,
                  label=f"{LBL[m]} (reference cluster)")
        ax_t.plot(ref["x"], ref["runtime"][m], ls="--", c=C[m], lw=1.6)
    for m, (xs, S) in ours["S"].items():
        if xs:
            ax_s.plot(xs, S, ls="-", marker="o", ms=5, c=C[m], lw=2,
                      label=f"{LBL[m]} (this framework, 1 TPU chip)")
    for m, (xs, rt) in ours["runtime"].items():
        if xs:
            ax_t.plot(xs, rt, ls="-", marker="o", ms=5, c=C[m], lw=2)
    if ub[0]:
        ax_s.plot(ub[0], ub[1], ls=":", c=C["nngp"], lw=1.4,
                  label=r"$S^*_{\rm nnGPara} = N/K$ (ours)")
    ax_s.axhline(1.0, ls="--", c="black", lw=0.8, label="fine solver")
    for ax in (ax_s, ax_t):
        ax.set_xscale("log", base=2)
        ax.set_xticks(xticks)
        ax.set_xticklabels([str(v) for v in xticks])
        ax.set_xlabel(xlabel)
        ax.grid(True, alpha=0.25, lw=0.5)
    ax_t.set_yscale("log")
    ax_s.set_ylabel(r"speed-up $\hat S$ vs own serial fine solve")
    ax_t.set_ylabel("end-to-end runtime (s)")
    ax_s.legend(fontsize=7.2, loc="upper left")


def hopf_figure():
    rows = _load_rows("hopf_%d.pkl", [32, 64, 128, 256, 512])
    xs, K, S, rt = _ours_series(rows, "nngp")
    ours = {"S": {"nngp": (xs, S)}, "runtime": {"nngp": (xs, rt)}}
    gp = _resumable_rows("Hopf", "gpjax-grid")
    if gp:
        gx = sorted(gp)
        ours["S"]["gp"] = (gx, [gp[x]["speedup"] for x in gx])
        ours["runtime"]["gp"] = (gx, [gp[x]["runtime"] for x in gx])
    ub = (xs, [x / k for x, k in zip(xs, K)])
    fig, (ax_s, ax_t) = plt.subplots(1, 2, figsize=(10, 4))
    ref = {"x": REF_HOPF["N"], "S": REF_HOPF["S"],
           "runtime": REF_HOPF["runtime"]}
    _panel(ax_s, ax_t, REF_HOPF["N"], ref, ours, ub, "N (time slices)")
    ax_s.set_title("Hopf bifurcation: speed-up scaling", fontsize=10)
    ax_t.set_title("Hopf: wall-clock (same problem, same $\\epsilon$)",
                   fontsize=10)
    fig.tight_layout()
    store_fig(fig, "hopf_scal_speedup")
    plt.close(fig)
    return {"N": xs, "K": K, "S": [round(v, 2) for v in S],
            "runtime_s": [round(v, 1) for v in rt],
            "gp_rows": sorted(gp) if gp else []}


def fhn_figure():
    rows = _load_rows("fhn_pde_%d.pkl", [10, 12, 14, 16])
    xs, K, S, rt = _ours_series(rows, "nngp")
    ours = {"S": {"nngp": (xs, S)}, "runtime": {"nngp": (xs, rt)}}
    ub = (xs, [512 / k for k in K])  # N=512 fixed (FHN_PDE.py:54)
    fig, (ax_s, ax_t) = plt.subplots(1, 2, figsize=(10, 4))
    ref = {"x": REF_FHN["dx"], "S": REF_FHN["S"], "runtime": REF_FHN["runtime"]}
    _panel(ax_s, ax_t, REF_FHN["dx"], ref, ours, ub,
           "dx  (state dimension d = 2 dx$^2$)")
    ax_s.set_title("FHN 2D PDE (N=512): speed-up vs dimension", fontsize=10)
    ax_t.set_title("FHN PDE: wall-clock (same problem, same $\\epsilon$)",
                   fontsize=10)
    fig.tight_layout()
    store_fig(fig, "fhn_pde_speedup")
    plt.close(fig)
    return {"dx": xs, "K": K, "S": [round(v, 2) for v in S],
            "runtime_s": [round(v, 1) for v in rt]}


if __name__ == "__main__":
    out = {"hopf": hopf_figure(), "fhn_pde": fhn_figure()}
    with open(os.path.join(RES, "speedup_plots.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
