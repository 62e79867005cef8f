"""Dissect the NaN nnGP-NM prediction at Burgers k=0 interval 8 (CPU)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from nngparareal_tpu.systems import Burgers
from nngparareal_tpu.solver import RKSolver
from nngparareal_tpu.models import NNGParareal, Dataset
from nngparareal_tpu.ops import gp as gpops
from nngparareal_tpu.ops import gp_lanes as gplanes
from nngparareal_tpu.ops.nn_select import nearest_neighbors
from nngparareal_tpu.ops.optim import nelder_mead


def main():
    T, N = 5.9, 128
    ode = Burgers(d_x=128, normalization="-11")
    solver = RKSolver(ode.get_vector_field(), 4, 40000, G="RK1", F="RK8")
    t = np.linspace(0.0, T, N + 1)
    u0 = jnp.asarray(ode.get_init_cond())
    uG = solver.run_G_chain(jnp.asarray(t), u0)
    uF = jnp.concatenate(
        [uG[:1],
         solver.run_F_batch(jnp.asarray(t[:-1]), jnp.asarray(t[1:]), uG[:-1])]
    )
    X, D = uG[:-1], uF[1:] - uG[1:]
    cap = 32 * N
    ds = Dataset.empty(cap, N).appended(X, D, jnp.ones(N), 0)

    model = NNGParareal(n=N, N=N, nn=18, optimizer="nm")
    model.fit(ds, 0)
    aux = model.sweep_aux(0, N, cap)

    dt_slice = T / N
    u_i = uF[1]
    for i in range(1, 9):
        aux_i = jax.tree.map(lambda a: a[i], aux)
        pred = model.predict_fn((), ds, u_i, uF[i + 1], uG[i + 1], aux_i,
                                jnp.asarray(i))
        print(i, "predmax", float(jnp.abs(pred).max()), flush=True)
        if i == 8 or not np.isfinite(float(jnp.abs(pred).max())):
            break
        u_i = pred + solver.coarse_step_raw(t[i], dt_slice, u_i)

    # dissect at this i
    m = 18
    idx, sqd_sel = nearest_neighbors(u_i, ds.X, ds.valid, m)
    xm = jnp.take(ds.X, idx, axis=0)
    ym = jnp.take(ds.D, idx, axis=0)
    mask = jnp.isfinite(sqd_sel).astype(float)
    print("neighbor idx", np.asarray(idx))
    print("d2 to q", np.asarray(sqd_sel))
    sqd_xx = gpops.pairwise_sq_dists(xm, xm)
    print("sqd_xx min offdiag",
          float(jnp.min(sqd_xx + jnp.eye(m) * 1e9)), flush=True)

    th, fv = model._optimize_thetas(sqd_xx, ym, mask, aux_i["theta0"])
    fvr = np.asarray(fv).reshape(N, -1)
    bad_coords = np.where(~np.isfinite(fvr.min(axis=1)))[0]
    print("coords with all-inf tasks:", bad_coords[:20], "count",
          bad_coords.size)
    nan_pred_coords = []
    pred = np.asarray(
        model.predict_fn((), ds, u_i, uF[min(9, N)], uG[min(9, N)], aux_i,
                         jnp.asarray(8))
    )
    nanc = np.where(~np.isfinite(pred))[0]
    print("NaN pred coords:", nanc[:20], "count", nanc.size)
    if nanc.size:
        c = int(nanc[0])
        fr = fvr[c]
        thr = np.asarray(th).reshape(N, -1, 2)[c]
        print("coord", c, "task fvals:", fr)
        print("task thetas:", thr)
        print("y stats:", float(jnp.abs(ym[:, c]).max()),
              float(jnp.abs(ym[:, c]).min()))
        # grid NLL landscape for this coordinate, jitter -16
        g = np.arange(-8.0, 0.0)
        vals = np.zeros((8, 8))
        for a, sx in enumerate(g):
            for b, sy in enumerate(g):
                vals[a, b] = float(gpops.nll_from_sqd(
                    sqd_xx, ym[:, c], jnp.asarray([sx, sy]), -16.0, mask,
                    gpops.k_se_log10))
        print("grid NLL finite count:", np.isfinite(vals).sum(), "/64")
        print("grid NLL min:", np.nanmin(vals[np.isfinite(vals)]) if np.isfinite(vals).any() else "none")


if __name__ == "__main__":
    main()
