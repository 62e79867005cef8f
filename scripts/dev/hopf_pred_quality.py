"""Compare nnGP prediction quality on Hopf between our optimizers and an
independent scipy Nelder-Mead implementation, on identical inputs.

Replays the parareal recursion manually for a few iterations; at each
interval computes the true defect F(q)-G(q) and the three predictions.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from scipy.optimize import minimize

from nngparareal_tpu import Hopf, Config, RKSolver
from nngparareal_tpu.models import NNGParareal, Dataset
from nngparareal_tpu.ops import gp as gpops
from nngparareal_tpu.ops.nn_select import nearest_neighbors


def scipy_nngp_predict(xm, ym, q, rng, n_restarts=1):
    """Straight implementation of the paper's per-query local GP with
    scipy Nelder-Mead (validation oracle)."""
    m, n = ym.shape
    d2 = ((xm[:, None, :] - xm[None, :, :]) ** 2).sum(-1)
    d2q = ((xm - q[None, :]) ** 2).sum(-1)
    preds = np.empty(n)
    for j in range(n):
        y = ym[:, j]
        best = (np.inf, None, None)
        for jit in np.arange(-20.0, -11.0):
            for _ in range(n_restarts):
                th0 = rng.integers(-8, 0, 2).astype(float)

                def nll(th):
                    K = 10.0 ** th[1] * np.exp(-0.5 * 10.0 ** (-th[0]) * d2)
                    K = K + np.eye(m) * 10.0 ** jit
                    try:
                        L = np.linalg.cholesky(K)
                    except np.linalg.LinAlgError:
                        return np.inf
                    al = np.linalg.solve(L.T, np.linalg.solve(L, y))
                    val = (0.5 * y @ al + np.log(np.diag(L)).sum()
                           + 0.5 * m * np.log(2 * np.pi))
                    return np.inf if np.isnan(val) else val

                res = minimize(nll, th0, method="Nelder-Mead",
                               options={"fatol": 1e-1, "xatol": 1e-1})
                if res.fun < best[0]:
                    best = (res.fun, res.x, jit)
        fv, th, jit = best
        K = 10.0 ** th[1] * np.exp(-0.5 * 10.0 ** (-th[0]) * d2)
        K = K + np.eye(m) * 10.0 ** jit
        kq = 10.0 ** th[1] * np.exp(-0.5 * 10.0 ** (-th[0]) * d2q)
        preds[j] = kq @ np.linalg.solve(K, y)
    return preds


def main():
    N = 32
    nn = 15
    ode = Hopf(normalization="-11")
    cfg = Config(ode, N=N).get()
    solver = RKSolver(ode.get_vector_field(), cfg["Ng"], cfg["Nf"],
                      G=cfg["G"], F=cfg["F"])
    T0, T1 = cfg["tspan"]
    t = np.linspace(T0, T1, N + 1)
    dt_slice = (T1 - T0) / N
    u0 = jnp.asarray(ode.get_init_cond())
    rng = np.random.default_rng(45)

    uG = solver.run_G_chain(jnp.asarray(t), u0)
    u = uG
    cap = 32 * N
    ds = Dataset.empty(cap, 3)
    I = 0

    grid_model = NNGParareal(n=3, N=N, nn=nn, optimizer="grid")
    nm_model = NNGParareal(n=3, N=N, nn=nn, optimizer="nm")

    for k in range(4):
        uF_tail = solver.run_F_batch(jnp.asarray(t[:-1]), jnp.asarray(t[1:]),
                                     u[:-1])
        uF = jnp.concatenate([u[:1], uF_tail])
        u_init = u.at[I + 1].set(uF[I + 1])
        I += 1
        valid_new = (np.arange(N) >= I - 1).astype(float)
        ds = ds.appended(u[:-1], uF[1:] - uG[1:], jnp.asarray(valid_new),
                         k * N)
        grid_model.fit(ds, k)
        nm_model.fit(ds, k)
        aux = nm_model.sweep_aux(k, N, cap)

        uG_rows = [uG[i] for i in range(I + 1)]
        u_rows = [u_init[i] for i in range(I + 1)]
        errs = {"grid": [], "nm": [], "scipy": []}
        for i in range(I, N):
            q = u_rows[i]
            uGn = solver.coarse_step_raw(t[i], dt_slice, q)
            truth = solver.fine_step_raw(t[i], dt_slice, q) - uGn

            pg = grid_model.predict_fn((), ds, q, uF[i + 1], uG[i + 1],
                                       None, jnp.asarray(i))
            aux_i = jax.tree.map(lambda a: a[i], aux)
            pn = nm_model.predict_fn((), ds, q, uF[i + 1], uG[i + 1],
                                     aux_i, jnp.asarray(i))
            m = min(nn, cap)
            idx, d2s = nearest_neighbors(q, ds.X, ds.valid, m)
            xm = np.asarray(jnp.take(ds.X, idx, axis=0))
            ym = np.asarray(jnp.take(ds.D, idx, axis=0))
            ps = scipy_nngp_predict(xm, ym, np.asarray(q), rng)

            tn = np.asarray(truth)
            errs["grid"].append(np.abs(np.asarray(pg) - tn).max())
            errs["nm"].append(np.abs(np.asarray(pn) - tn).max())
            errs["scipy"].append(np.abs(ps - tn).max())
            # follow the GRID model's recursion
            u_next_i = jnp.where(jnp.isfinite(pg), pg,
                                 uF[i + 1] - uG[i + 1]) + uGn
            u_rows.append(u_next_i)
            uG_rows.append(uGn)
        for kk, v in errs.items():
            print(f"k={k} {kk}: max {np.max(v):.3e} mean {np.mean(v):.3e}",
                  flush=True)
        u_next = jnp.stack(u_rows)
        uG = jnp.stack(uG_rows)
        u = u_next


if __name__ == "__main__":
    main()
