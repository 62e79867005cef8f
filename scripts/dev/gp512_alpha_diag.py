"""Diagnose the gp512 posterior-solve NaN-residual exhaustion (session 5).

Loads the iter-17 checkpoint, inspects the dataset, and replays the
alpha solve + residual check in IEEE f64 on CPU for the checkpointed
model state's (theta, jitter) and a jitter-escalation ladder.
"""
import os
import sys
sys.path.insert(0, os.getcwd())
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import pickle
import numpy as np

CK = ("results/ckpt/Hopf_512_gpjax-grid_5e-07__nf_mul-10000_score-f32/"
      "Hopf_512_512_GP_int/Hopf_512_512_GP_int_17")

p = pickle.load(open(CK, "rb"))
X, D, V = p["ds_X"], p["ds_D"], p["ds_valid"]
m = V > 0
print("k", p["k"], "I", p["I"], "rows valid", m.sum(), "cap", X.shape)
print("X finite:", np.isfinite(X[m]).all(), "D finite:", np.isfinite(D[m]).all())
print("X range:", X[m].min(), X[m].max(), "D range:", D[m].min(), D[m].max())
# duplicates
Xv = X[m]
_, counts = np.unique(np.round(Xv, 12), axis=0, return_counts=True)
print("dup rows (rounded 1e-12):", int((counts > 1).sum()), "max mult", counts.max())

st = p["model_state"]
print("model_state keys:", list(st.keys()) if isinstance(st, dict) else type(st))
if isinstance(st, dict):
    for k_, v_ in st.items():
        try:
            a = np.asarray(v_, dtype=float)
            print(" ", k_, a.shape, a.dtype,
                  "finite" if np.isfinite(a).all() else "NONFINITE")
        except (TypeError, ValueError):
            print(" ", k_, type(v_).__name__)

# replay the solve in IEEE f64 (scipy) for the stored thetas
thetas = np.asarray(st.get("thetas")) if isinstance(st, dict) else None
jit_sel = np.asarray(st.get("jitter_sel")) if isinstance(st, dict) and "jitter_sel" in st else None
print("thetas:", thetas, "jitter_sel:", jit_sel)

import scipy.linalg as sla

def try_solve(theta, ljit, Xv, y):
    # SE kernel as in ops/gp_lanes: sigma^2 * exp(-||dx||^2 / (2 l^2)) —
    # check the actual kernel form below before trusting constants.
    sq = ((Xv[:, None, :] - Xv[None, :, :]) ** 2).sum(-1)
    K = theta[1] * np.exp(-0.5 * sq / theta[0]) if False else None
    return K

# Instead of guessing the kernel, use the package's own alpha_resid fns.
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from nngparareal_tpu.models.gp import GParareal
from nngparareal_tpu.models.base import Dataset

N = p["N"]; n = X.shape[1]
mdl = GParareal(n=n, N=N, optimizer="grid", score_dtype="f32")
mdl.set_ckpt_state(st)
ds = Dataset(jnp.asarray(X), jnp.asarray(D), jnp.asarray(V))
rows = min((p["k"] + 1 + 1) * N, X.shape[0])
B = GParareal._bucket(rows, X.shape[0])
print("fit bucket B:", B)
dsX, dsD, dsV = ds.X[:B], ds.D[:B], ds.valid[:B]
fit_warm, alphas, make_obj, fit_grid, alpha_resid = mdl._get_fns(B)

th = np.asarray(mdl.thetas, float)
for lj in (jit_sel if jit_sel is not None else np.full(n, -12.0),
           np.full(n, -8.0), np.full(n, -6.0), np.full(n, -4.0),
           np.full(n, -2.0)):
    jv = np.asarray(lj, float)
    a = alphas(dsX, dsD, dsV, jnp.asarray(th), jnp.asarray(jv))
    rel = np.asarray(alpha_resid(dsX, dsD, dsV, jnp.asarray(th),
                                 jnp.asarray(jv), a))
    print("jitter", jv.tolist(), "-> alpha finite:",
          bool(np.isfinite(np.asarray(a)).all()), "rel res:", rel.tolist())
