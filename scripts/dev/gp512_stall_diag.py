"""Diagnose the gp512 plateau: is the on-chip ~49-bit f64 alpha solve the
reason the GParareal corrector stalls at max-err ~3e-3 on Hopf N=512?

Test: at the checkpoint's exact (theta, jitter), compute leave-one-out
residuals of the GP fit on the iter-30 dataset in (a) IEEE f64 and
(b) with the Gram rounded entrywise to double-single f32 (~49-bit),
which upper-bounds on-chip precision. LOO_i = alpha_i / Ainv_ii.
"""
import pickle, numpy as np, scipy.linalg as sla, json, sys

p = 'results/ckpt/Hopf_512_gpjax-grid_5e-07__nf_mul-10000_score-f32/Hopf_512_512_GP_int/Hopf_512_512_GP_int_30'
d = pickle.load(open(p, 'rb'))
X = np.asarray(d['ds_X'], np.float64)
D = np.asarray(d['ds_D'], np.float64)
V = np.asarray(d['ds_valid']).astype(bool)
X, D = X[V], D[V]
n = X.shape[0]
ms = d['model_state']
th = np.asarray(ms['thetas'])
jp = np.asarray(ms['jitter_sel'])
print(f'n={n}', flush=True)

def loo(K, y, jit):
    A = K + np.eye(n) * jit
    c, low = sla.cho_factor(A, lower=True, check_finite=False)
    alpha = sla.cho_solve((c, low), y, check_finite=False)
    Linv = sla.solve_triangular(c, np.eye(n), lower=True, check_finite=False)
    Ainv_diag = (Linv ** 2).sum(axis=0)
    return alpha / Ainv_diag  # LOO residuals

out = {}
for coord in (0, 1):
    sx, sy = th[coord]
    y = D[:, coord]
    jit = 10.0 ** jp[coord]
    # squared distances
    sq = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1) if n < 6000 else None
    if sq is None:
        nrm = (X ** 2).sum(1)
        sq = nrm[:, None] + nrm[None, :] - 2.0 * (X @ X.T)
        np.maximum(sq, 0, out=sq)
    K = (sy ** 2) * np.exp(-0.5 * sq / (sx ** 2))
    del sq
    # (a) IEEE f64
    r64 = loo(K, y, jit)
    # (b) 49-bit double-single rounding of K entries
    hi = K.astype(np.float32).astype(np.float64)
    lo = (K - hi).astype(np.float32).astype(np.float64)
    Kds = hi + lo
    del hi, lo
    rds = loo(Kds, y, jit)
    del K, Kds
    out[coord] = dict(
        y_rms=float(np.sqrt((y**2).mean())), y_max=float(np.abs(y).max()),
        loo64_rms=float(np.sqrt((r64**2).mean())), loo64_max=float(np.abs(r64).max()),
        loods_rms=float(np.sqrt((rds**2).mean())), loods_max=float(np.abs(rds).max()),
    )
    print(coord, json.dumps(out[coord]), flush=True)
json.dump(out, open('results/gp512_stall_diag.json', 'w'), indent=1)
print('done', flush=True)
