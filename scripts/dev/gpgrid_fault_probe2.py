"""On-chip bisect #2 for the gpjax-grid TPU worker crash (round 3).

Every on-chip gpjax-grid run except FHN (n=2) dies with UNAVAILABLE
(kernel fault) inside the FIRST _fit_grid_search fetch after resume at
k=3 (B=256 bucket). FHN from-scratch (n=2, buckets 64..256) completed
K=5. This probe replays JUST the grid fit from the stored Rossler
checkpoint (results/ckpt/..._int_2), so the data, shapes, and bucket are
exactly the failing ones — one variant per process.

Usage: python scripts/dev/gpgrid_fault_probe2.py <variant>
  exact    n=3 ckpt data, B=bucket(160)=256         (expect: crash)
  synth    same shapes, random well-conditioned data (shape vs data)
  n2       ckpt data, coordinate 2 dropped -> T=18   (T boundary)
  f32      exact + score_dtype=f32                   (emulated-f64 angle)
  chunk16  exact + grid_chunk=16                     (program structure)
  b128     ckpt data truncated to 128 rows, B=128    (capacity boundary)
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

from nngparareal_tpu.models.gp import GParareal

CKPT = ("results/ckpt/Rossler_40_gpjax-grid_5e-07/"
        "Rossler_40_GP_int/Rossler_40_GP_int_2")

variant = sys.argv[1] if len(sys.argv) > 1 else "exact"
print("backend:", jax.default_backend(), "variant:", variant, flush=True)

with open(CKPT, "rb") as fh:
    p = pickle.load(fh)
X, D, V = p["ds_X"], p["ds_D"], p["ds_valid"]
k = p["k"] + 1  # the fit that crashes is the next iteration's
N = p["N"]
rows = min((k + 1) * N, X.shape[0])
B = 1
while B < rows:
    B *= 2
B = min(B, X.shape[0])
n = X.shape[1]

kw = {}
if variant == "synth":
    rng = np.random.default_rng(0)
    X = np.zeros_like(X); X[:rows] = rng.normal(size=(rows, n))
    D = np.zeros_like(D); D[:rows] = 1e-3 * rng.normal(size=(rows, n))
    V = np.zeros_like(V); V[:rows] = 1.0
elif variant == "n2":
    X, D = X[:, :2], D[:, :2]
    n = 2
elif variant == "f32":
    kw["score_dtype"] = jnp.float32
elif variant == "chunk16":
    kw["grid_chunk"] = 16
elif variant == "b128":
    B = 128
    rows = 128

print("rows:", int(np.sum(V[:B])), "bucket:", B, "n:", n, "T:", n * 9,
      flush=True)

mdl = GParareal(n, N, optimizer="grid", **kw)
fit_grid = mdl._get_fns(B)[3]
dsX, dsD, dsV = jnp.asarray(X[:B]), jnp.asarray(D[:B]), jnp.asarray(V[:B])

t0 = time.time()
th, jv, fv = mdl._fit_grid_search(fit_grid, dsX, dsD, dsV)
print("OK", variant, round(time.time() - t0, 1), "s; fv:",
      np.round(fv, 2).tolist(), "th:", np.round(th, 4).tolist(), flush=True)
