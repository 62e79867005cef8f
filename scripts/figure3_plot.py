"""Figure-3 equivalent plot: K distribution across m and seeds, 6 systems.

Reference Figure_3.py:136-213 renders per-system grouped bars of K
frequency over seeds for each m. Input: results/figure3_k_grid.json
(ours) + results/ref_figure3_k.json (mined from the reference's
checked-in pickles). Output: img/figure3_k_dist.(png|pdf).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from nngparareal_tpu.utils.io import store_fig

NAME_MAP = {
    "fhn_n": "FHN_ODE", "rossler_long_n": "Rossler", "non_aut32_n": "Hopf",
    "brus_2d_n": "Brusselator", "lorenz_n": "Lorenz", "dbl_pend_n": "DblPend",
}
SYSTEMS = ["FHN_ODE", "Rossler", "Hopf", "Brusselator", "Lorenz", "DblPend"]
MS = ["adaptive", "11", "12", "13", "14", "15", "16"]


def main():
    ours = json.load(open("results/figure3_k_grid.json"))
    ref = json.load(open("results/ref_figure3_k.json"))

    our_nm, our_grid, ref_d = {}, {}, {}
    for r in ours:
        if r["eps"] != 5e-07 or "K" not in r:
            continue
        key = (r["system"], str(r["m"]))
        if r["optimizer"] == "grid":
            our_grid[key] = r["K"]
        else:
            our_nm.setdefault(key, []).append(r["K"])
    for r in ref:
        if r["eps"] != 5e-07 or r.get("K") is None:
            continue
        key = (NAME_MAP.get(r["system"], r["system"]), str(r["m"]))
        ref_d.setdefault(key, []).append(r["K"])

    fig, axes = plt.subplots(2, 3, figsize=(15, 7), sharex=True)
    x = np.arange(len(MS))
    w = 0.38
    for ax, s in zip(axes.ravel(), SYSTEMS):
        rmed = [np.median(ref_d[(s, m)]) if (s, m) in ref_d else np.nan
                for m in MS]
        rlo = [np.min(ref_d[(s, m)]) if (s, m) in ref_d else np.nan
               for m in MS]
        rhi = [np.max(ref_d[(s, m)]) if (s, m) in ref_d else np.nan
               for m in MS]
        omed = [np.median(our_nm[(s, m)]) if (s, m) in our_nm else np.nan
                for m in MS]
        olo = [np.min(our_nm[(s, m)]) if (s, m) in our_nm else np.nan
               for m in MS]
        ohi = [np.max(our_nm[(s, m)]) if (s, m) in our_nm else np.nan
               for m in MS]
        g = [our_grid.get((s, m), np.nan) for m in MS]

        ax.bar(x - w / 2, rmed, w, yerr=[np.subtract(rmed, rlo),
                                         np.subtract(rhi, rmed)],
               capsize=3, label="reference (seeds 45-49)", color="#9ecae1")
        ax.bar(x + w / 2, omed, w, yerr=[np.subtract(omed, olo),
                                         np.subtract(ohi, omed)],
               capsize=3, label="ours NM (seeds 45-49)", color="#fdae6b")
        ax.plot(x, g, "k_", markersize=14, label="ours grid (deterministic)")
        ax.set_title(s)
        ax.set_xticks(x)
        ax.set_xticklabels(MS, rotation=45)
        ax.grid(axis="y", alpha=0.3)
    axes[0, 0].set_ylabel("K to convergence")
    axes[1, 0].set_ylabel("K to convergence")
    axes[1, 1].set_xlabel("m (nearest neighbours)")
    axes[0, 0].legend(fontsize=8)
    fig.suptitle("nnGParareal: K distribution across m and seeds "
                 "(eps=5e-7) — reference vs this framework")
    fig.tight_layout()
    store_fig(fig, "figure3_k_dist")
    print("stored img/figure3_k_dist.png")


if __name__ == "__main__":
    main()
