"""Summarize the Burgers K-vs-m seed study (reference
Burgers_perf_across_m.py:136-272 analysis half).

Reads results/burgers_across_m_T{T}.pkl and prints per-m K quantiles
next to the reference's published distribution facts (T=5.9, m=18:
K median 17-19 over 100 seeds; published single-seed Table value 14).
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nngparareal_tpu.utils.io import read_pickle


def main():
    T = sys.argv[1] if len(sys.argv) > 1 else "5.9"
    rows = read_pickle(f"burgers_across_m_T{T}.pkl", "results")
    ok = [r for r in rows if "k" in r]
    bad = [r for r in rows if "error" in r]
    ms = sorted({r["m"] for r in ok})
    print(f"T={T}: {len(ok)} runs, {len(bad)} failures")
    print(f"{'m':>4} {'n':>3} {'min':>4} {'q25':>5} {'med':>5} {'q75':>5} "
          f"{'max':>4}  {'med speedup':>11}")
    for m in ms:
        ks = np.array([r["k"] for r in ok if r["m"] == m])
        sp = np.array([r["speedup"] for r in ok if r["m"] == m])
        q = np.quantile(ks, [0.25, 0.5, 0.75])
        print(f"{m:>4} {len(ks):>3} {ks.min():>4} {q[0]:>5.1f} {q[1]:>5.1f} "
              f"{q[2]:>5.1f} {ks.max():>4}  {np.median(sp):>11.2f}")


if __name__ == "__main__":
    main()
