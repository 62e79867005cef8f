"""Mine the reference's checked-in TomLab result pickles for K-vs-tolerance
sensitivity (VERDICT r2 item 6 / 'what's weak' #4).

Our TomLab K at N=128/256 sits 10-20% above the published values (73-78 vs
63, 167 vs 159) while N=32/64/512 match. The hypothesis is that K on this
chaotic system is hypersensitive to sub-ulp arithmetic differences, so any
implementation lands somewhere in a wide K band. This script bounds that
band FROM THE REFERENCE'S OWN DATA: it loads the reference's stored
per-slice/per-iteration error history (reference new_lib.py:1038-1051 is
the convergence logic that produced it) and replays the prefix-convergence
rule at scaled tolerances eps*c. The slope |dK/dlog(eps)| around c=1
measures how many iterations K moves per factor-of-2 change in effective
error level — i.e. how much K spread a last-ulp-scale perturbation of the
fine solver can produce.

Caveat: replaying err at a looser eps' approximates the K an actual eps'
run would reach (frozen-slice feedback is ignored), but the local slope at
c=1 is exact to first order and that is the quantity of interest.

Reads /root/reference pickles (data only; unpickling needs the reference
modules importable, hence the jax.config/mpi4py shims). Writes
results/tomlab_ref_sensitivity.json.
"""

import glob
import json
import os
import pickle
import sys
import types
import warnings

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def _shim():
    import jax

    m = types.ModuleType("jax.config")
    m.config = jax.config
    sys.modules["jax.config"] = m
    for name in ("mpi4py", "mpi4py.futures"):
        mm = types.ModuleType(name)
        mm.MPIPoolExecutor = object
        sys.modules[name] = mm
    sys.path.insert(0, REF)


def replay_K(err, eps):
    """Prefix-convergence replay (reference new_lib.py:1044-1051):
    err[p, k] < eps advances the frozen prefix; K = first k with I == N."""
    Np1, Kmax = err.shape
    N = Np1 - 1
    I = 0
    for k in range(Kmax):
        p = I + 1
        while p <= N and err[p, k] < eps:
            I += 1
            p += 1
        if I == N:
            return k + 1
    return None  # did not converge within the stored history


def margins(err, eps, k):
    """min unconverged err/eps at iteration k (distance to the threshold)."""
    col = err[:, k]
    active = col[col > 0]
    if active.size == 0:
        return None
    return float(np.min(active) / eps)


def main():
    _shim()
    warnings.filterwarnings("ignore")
    out = []
    for path in sorted(glob.glob(f"{REF}/tomlab_scal_final/tomlab_scal_final_*_nngp")):
        Nname = path.rsplit("/", 1)[-1]
        obj = pickle.load(open(path, "rb"))
        eps = float(obj.epsilon)
        for run_key, r in obj.runs.items():
            err = np.asarray(r.get("err"))
            if err.ndim != 2:
                continue
            k_pub = int(r["k"])
            row = {
                "pickle": Nname, "run": str(run_key), "N": int(obj.N),
                "eps": eps, "published_K": k_pub,
                "replay_K@1x": replay_K(err, eps),
            }
            for c in (0.25, 0.5, 2.0, 4.0):
                row[f"replay_K@{c}x"] = replay_K(err, c * eps)
            # threshold margins over the last quarter of the run: how close
            # the binding slice sits to eps when it finally converges
            tail = [margins(err, eps, k) for k in range(max(0, k_pub - 8), k_pub)]
            row["tail_min_err_over_eps"] = [
                round(m, 3) for m in tail if m is not None
            ]
            out.append(row)
            print(row, flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/tomlab_ref_sensitivity.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
