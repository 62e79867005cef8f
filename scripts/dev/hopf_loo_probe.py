"""Probe the LOO vs NLL candidate choice on Hopf-32 late iterations.

Runs nnGP(grid) to an early-stop iteration, then for the first few
unconverged intervals evaluates every top-S grid candidate's TRUE
prediction error (vs a fine solve), its NLL, and its LOO score — does LOO
rank the good candidates first, and does the gate/walk keep the choice?
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from nngparareal_tpu import Hopf, Config, RKSolver, Parareal
from nngparareal_tpu.models import NNGParareal, Dataset
from nngparareal_tpu.ops import gp as gpops
from nngparareal_tpu.ops import gp_lanes as gplanes
from nngparareal_tpu.ops.nn_select import nearest_neighbors


def main():
    N, nn = 32, 15
    K_STOP = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    ode = Hopf(normalization="-11")
    cfg = Config(ode, N=N).get()
    solver = RKSolver(ode.get_vector_field(), cfg["Ng"], cfg["Nf"],
                      G=cfg["G"], F=cfg["F"])
    p = Parareal(ode, solver, cfg["tspan"], N, epsilon=5e-7, verbose=None)
    out = p.run(model="nngp", nn=nn, optimizer="grid", early_stop=K_STOP,
                keep_history=True)
    I = out["conv_int"][-1]
    print("after k =", out["k"], "I =", I, "conv_int", out["conv_int"])
    x, D = out["x"], out["D"]
    cap = 32 * N
    ds = Dataset.empty(cap, 3).appended(jnp.asarray(x), jnp.asarray(D),
                                        jnp.ones(x.shape[0]), 0)
    t = out["t"]
    dt_slice = (t[-1] - t[0]) / N
    u = out["u"]

    model = NNGParareal(n=3, N=N, nn=nn, optimizer="grid")
    model.fit(ds, out["k"])
    m = min(model.m_for(out["k"]), cap)

    for i in range(I, min(I + 3, N)):
        q = jnp.asarray(u[i])
        uGn = solver.coarse_step_raw(t[i], dt_slice, q)
        truth = np.asarray(solver.fine_step_raw(t[i], dt_slice, q) - uGn)

        idx, _ = nearest_neighbors(q, ds.X, ds.valid, m)
        xm = jnp.take(ds.X, idx, axis=0)
        ym = jnp.take(ds.D, idx, axis=0)
        mask = jnp.ones(m)
        sqd_xx = gpops.pairwise_sq_dists(xm, xm)
        sqd_xq = gpops.sq_dists_to(q, xm)

        # standardization as predict_fn does
        count = jnp.maximum(jnp.sum(mask), 1.0)
        power = jnp.sum((ym * mask[:, None]) ** 2, axis=0) / count
        glob = jnp.max(power)
        y_scale = jnp.where(glob > 0, jnp.sqrt(glob), 1.0)
        shift = -2.0 * jnp.log10(y_scale)
        ym_fit = ym / y_scale

        gx, gy = jnp.meshgrid(jnp.arange(-8.0, 0.0), jnp.arange(-8.0, 0.0))
        grid0 = jnp.stack([gx.ravel(), gy.ravel()], axis=1)
        jit9 = jnp.asarray(np.arange(-20.0, -11.0)) + shift
        combo_th = jnp.repeat(grid0, 9, axis=0)
        combo_jit = jnp.tile(jit9, grid0.shape[0])
        fv_all = gplanes.nll_lanes(sqd_xx, ym_fit, combo_th, combo_jit, mask)

        S = 12
        for c in range(3):
            negv, topidx = jax.lax.top_k(-fv_all[c], S)
            fvc = -negv
            thc = combo_th[topidx]
            jtc = combo_jit[topidx]
            loo = gplanes.loo_lanes(
                sqd_xx, jnp.repeat(ym_fit[:, c:c+1], S, axis=1)[:, None, :],
                thc, jtc, mask,
            )[0]
            pm = gplanes.posterior_mean_lanes(
                sqd_xx, sqd_xq, jnp.repeat(ym_fit[:, c:c+1], S, axis=1),
                thc, jtc, mask,
            ) * y_scale
            err = np.abs(np.asarray(pm) - truth[c])
            rows = []
            for s in range(S):
                rows.append(
                    f"    s={s} th=({float(thc[s,0]):5.1f},{float(thc[s,1]):5.1f}) "
                    f"jit={float(jtc[s]-shift):5.1f} nll={float(fvc[s]):9.3f} "
                    f"loo={float(loo[s]):10.3e} err={err[s]:9.2e}"
                )
            best_err = int(np.argmin(err))
            best_loo = int(np.argmin(np.asarray(loo)))
            print(f"i={i} coord={c} |truth|={abs(truth[c]):.2e} "
                  f"nll_pick err={err[0]:.2e} loo_pick(s={best_loo}) err={err[best_loo]:.2e} "
                  f"oracle(s={best_err}) err={err[best_err]:.2e}")
            for r in rows:
                print(r)


if __name__ == "__main__":
    main()
