"""gp512 alpha-solve replication in IEEE f64 scipy on the VALID rows only.

Checkpoint thetas: coords 0,1 (sx=6.31e-4, sy=1.68e-3) jitter 1e-12;
coord 2 (sx=6.31, sy=1.12e-5) jitter 1e-14. Kernel k_se_linear:
K = sy^2 * exp(-0.5 * sqd / sx^2)  (ops/gp.py).
"""
import pickle
import numpy as np
import scipy.linalg as sla
from scipy.spatial.distance import cdist

CK = ("results/ckpt/Hopf_512_gpjax-grid_5e-07__nf_mul-10000_score-f32/"
      "Hopf_512_512_GP_int/Hopf_512_512_GP_int_17")
p = pickle.load(open(CK, "rb"))
X, D, V = p["ds_X"], p["ds_D"], p["ds_valid"]
m = V > 0
Xv, Dv = X[m], D[m]
print("valid rows:", Xv.shape[0])
st = p["model_state"]
th = np.asarray(st["thetas"])
jv = np.asarray(st["jitter_sel"])
sqd = cdist(Xv, Xv, "sqeuclidean")

for c in range(3):
    sx, sy = th[c]
    y = Dv[:, c]
    for lj in (jv[c], -10.0, -8.0, -6.0, -4.0):
        K = sy ** 2 * np.exp(-0.5 * sqd / sx ** 2)
        K[np.diag_indices_from(K)] += 10.0 ** lj
        try:
            cf = sla.cho_factor(K, lower=True)
            a = sla.cho_solve(cf, y)
            r = K @ a - y
            rel = np.linalg.norm(r) / max(np.linalg.norm(y), 1e-300)
            print(f"coord {c} sx={sx:.3g} sy={sy:.3g} j=1e{lj:+.0f}: "
                  f"chol OK rel={rel:.2e}")
        except Exception as e:
            print(f"coord {c} sx={sx:.3g} sy={sy:.3g} j=1e{lj:+.0f}: "
                  f"FAIL {e}")
        if lj == jv[c]:
            continue
        break  # after the stored jitter, just try one escalation that works
