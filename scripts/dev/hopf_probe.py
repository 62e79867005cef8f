"""Probe _grid_shared internals on the failing Hopf late-iteration case."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

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
    ode = Hopf(normalization="-11")
    cfg = Config(ode, N=N).get()
    solver = RKSolver(ode.get_vector_field(), cfg["Ng"], cfg["Nf"],
                      G=cfg["G"], F=cfg["F"])
    p = Parareal(ode, solver, cfg["tspan"], N, epsilon=5e-7, verbose=None)
    out = p.run(model="nngp", nn=nn, optimizer="grid", early_stop=8)
    I = out["conv_int"][-1]
    x, D = out["x"], out["D"]
    cap = 32 * N
    ds = Dataset.empty(cap, 3).appended(jnp.asarray(x), jnp.asarray(D),
                                        jnp.ones(x.shape[0]), 0)
    u = out["u"]
    q = jnp.asarray(u[I])
    model = NNGParareal(n=3, N=N, nn=nn, optimizer="grid")
    model.fit(ds, out["k"])
    m = min(model.m_for(out["k"]), cap)
    idx, _ = nearest_neighbors(q, ds.X, ds.valid, m)
    xm = jnp.take(ds.X, idx, axis=0)
    ym = jnp.take(ds.D, idx, axis=0)
    mask = jnp.ones(m)

    sqd_xx = gpops.pairwise_sq_dists(xm, xm)
    sqd_xq = gpops.sq_dists_to(q, xm)
    print("sqd_xx diag-offenders: min offdiag",
          float(jnp.min(sqd_xx + 1e9 * jnp.eye(m))))
    count = jnp.maximum(jnp.sum(mask), 1.0)
    power = jnp.sum((ym * mask[:, None]) ** 2, axis=0) / count
    print("per-coord power:", np.asarray(power))
    glob = jnp.max(power)
    y_scale = jnp.where(glob > 0, jnp.sqrt(glob), 1.0)
    shift = -2.0 * jnp.log10(y_scale)
    print("y_scale", float(y_scale), "jitter shift", float(shift))
    ym_fit = ym / y_scale

    th, fv = model._grid_shared(sqd_xx, ym_fit, mask, shift)
    fvr = np.asarray(fv).reshape(3, -1)
    print("per-coord finite tasks:", np.isfinite(fvr).sum(axis=1),
          "min fv:", np.nanmin(np.where(np.isfinite(fvr), fvr, np.nan), axis=1))

    # replicate the posterior selection
    per = model.B // 3
    jv = (model._jitter_vals + shift).reshape(3, per)
    thr = np.asarray(th).reshape(3, per, 2)
    best = np.argmin(np.asarray(fvr), axis=1)
    for c in range(3):
        print(f"coord {c}: best task {best[c]} th={thr[c, best[c]]} "
              f"jit={np.asarray(jv)[c, best[c]]:.2f} fv={fvr[c, best[c]]:.3e}")
        pm = gplanes.posterior_mean_lanes(
            sqd_xx, sqd_xq, ym_fit[:, c:c+1],
            jnp.asarray(thr[c, best[c]])[None],
            jnp.asarray(jv[c, best[c]])[None], mask,
        )
        print("   posterior (scaled):", float(pm[0]))


if __name__ == "__main__":
    main()
