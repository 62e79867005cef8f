"""Replay the Hopf-32 recursion along the scipy-oracle trajectory and, at
each late-iteration (k, i, coord), compare:

* scipy's Nelder-Mead pick (theta, jitter, NLL) and its true error
  (this drives the recursion — the K=9 path);
* our grid-search pick and its posterior error in three variants:
  unshifted jitter (NaN -> bare fallback), shifted jitter, pivot-floored.

Prints divergent cases so the grid's late-iteration failure mode is
directly visible against the oracle's choices.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from nngparareal_tpu import Hopf, Config, RKSolver
from nngparareal_tpu.models import Dataset
from nngparareal_tpu.models.nngp_scipy import NNGPScipy, _nll_np
from nngparareal_tpu.ops import gp as gpops
from nngparareal_tpu.ops import gp_lanes as gplanes
from nngparareal_tpu.ops.nn_select import nearest_neighbors


def grid_pick(sqd_xx, ym, mask, n):
    """Mirror NNGParareal._grid_shared + predict_fn standardization; returns
    per-coordinate (theta (2,), jit_unshifted, jit_shifted, y_scale)."""
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
    best = jnp.argmin(fv_all, axis=1)
    th_b = combo_th[best]
    jit_b = combo_jit[best]
    fv_b = jnp.take_along_axis(fv_all, best[:, None], 1)[:, 0]

    # walk + refine, jitter locked (grid_walk=4, grid_refine=2, fatol=0.1)
    sched = [(1.0, 0.1)] * 4 + [(0.5, 0.0), (0.25, 0.0)]
    for step, gate in sched:
        offs = step * jnp.array([-1.0, 0.0, 1.0])
        ox, oy = jnp.meshgrid(offs, offs)
        neigh = jnp.stack([ox.ravel(), oy.ravel()], axis=1)
        cands = (th_b[:, None, :] + neigh[None]).reshape(-1, 2)
        jit_c = jnp.repeat(jit_b, 9)
        y_c = jnp.repeat(ym_fit, 9, axis=1)
        fv_r = gplanes.nll_lanes(sqd_xx, y_c[:, None, :], cands, jit_c, mask)[0].reshape(n, 9)
        b = jnp.argmin(fv_r, axis=1)
        th_new = jnp.take_along_axis(cands.reshape(n, 9, 2), b[:, None, None], 1)[:, 0]
        fv_new = jnp.take_along_axis(fv_r, b[:, None], 1)[:, 0]
        imp = fv_new < fv_b - gate
        th_b = jnp.where(imp[:, None], th_new, th_b)
        fv_b = jnp.where(imp, fv_new, fv_b)
    # jitter rescan
    cands = jnp.repeat(th_b, 9, axis=0)
    jit_c = jnp.tile(jit9, (n,))
    y_c = jnp.repeat(ym_fit, 9, axis=1)
    fv_r = gplanes.nll_lanes(sqd_xx, y_c[:, None, :], cands, jit_c, mask)[0].reshape(n, 9)
    b = jnp.argmin(fv_r, axis=1)
    jit_new = jit9[b]
    fv_new = jnp.take_along_axis(fv_r, b[:, None], 1)[:, 0]
    imp = fv_new < fv_b - 0.1
    jit_b = jnp.where(imp, jit_new, jit_b)
    fv_b = jnp.where(imp, fv_new, fv_b)
    return (np.asarray(th_b), np.asarray(jit_b - shift), np.asarray(jit_b),
            float(y_scale), float(shift), np.asarray(fv_b))


def post_np(d2, d2q, y, th, jit):
    m = y.shape[0]
    K = 10.0 ** th[1] * np.exp(-0.5 * 10.0 ** (-th[0]) * d2)
    K = K + np.eye(m) * 10.0 ** jit
    kq = 10.0 ** th[1] * np.exp(-0.5 * 10.0 ** (-th[0]) * d2q)
    try:
        return kq @ np.linalg.solve(K, y)
    except np.linalg.LinAlgError:
        return np.nan


def main():
    N, nn = 32, 15
    K_SHOW = 5  # start printing from this iteration
    ode = Hopf(normalization="-11")
    cfg = Config(ode, N=N).get()
    solver = RKSolver(ode.get_vector_field(), cfg["Ng"], cfg["Nf"],
                      G=cfg["G"], F=cfg["F"])
    T0, T1 = cfg["tspan"]
    t = np.linspace(T0, T1, N + 1)
    dt_slice = (T1 - T0) / N
    u0 = jnp.asarray(ode.get_init_cond())

    oracle = NNGPScipy(n=3, N=N, nn=nn, record=True)

    uG = solver.run_G_chain(jnp.asarray(t), u0)
    u = uG
    cap = 32 * N
    ds = Dataset.empty(cap, 3)
    I = 0
    eps = 5e-7

    for k in range(12):
        uF_tail = solver.run_F_batch(jnp.asarray(t[:-1]), jnp.asarray(t[1:]),
                                     u[:-1])
        uF = jnp.concatenate([u[:1], uF_tail])
        u_init = u.at[I + 1].set(uF[I + 1])
        valid_new = (np.arange(N) >= I).astype(float)
        ds = ds.appended(u[:-1], uF[1:] - uG[1:], jnp.asarray(valid_new),
                         k * N)
        I += 1
        oracle.fit(ds, k)
        m = min(oracle.m_for(k), cap)

        u_rows = [np.asarray(u_init[i]) for i in range(I + 1)]
        uG_rows = [np.asarray(uG[i]) for i in range(I + 1)]
        for i in range(I, N):
            q = jnp.asarray(u_rows[i])
            uGn = np.asarray(solver.coarse_step_raw(t[i], dt_slice, q))
            truth = np.asarray(solver.fine_step_raw(t[i], dt_slice, q)) - uGn

            # oracle predictions drive the recursion
            preds = np.asarray(
                oracle.predict_fn((), ds, q, uF[i + 1], uG[i + 1], None, i)
            )
            if k >= K_SHOW and i < I + 3:
                # grid picks on identical inputs
                idx, _ = nearest_neighbors(q, ds.X, ds.valid, m)
                xm = jnp.take(ds.X, idx, axis=0)
                ym = jnp.take(ds.D, idx, axis=0)
                mask = jnp.isfinite(
                    jnp.where(jnp.take(ds.valid, idx) > 0, 0.0, jnp.nan)
                ).astype(float)
                sqd_xx = gpops.pairwise_sq_dists(xm, xm)
                d2 = np.asarray(sqd_xx)
                d2q = np.asarray(gpops.sq_dists_to(q, xm))
                th_g, jit_g_raw, jit_g_sh, yscale, shift, fv_g = grid_pick(
                    sqd_xx, ym, mask, 3
                )
                ymn = np.asarray(ym)
                picks = oracle.picks.get((k, i))
                for c in range(3):
                    e_or = abs(preds[c] - truth[c])
                    p_raw = post_np(d2, d2q, ymn[:, c] / yscale,
                                    th_g[c], jit_g_raw[c]) * yscale
                    p_sh = post_np(d2, d2q, ymn[:, c] / yscale,
                                   th_g[c], jit_g_sh[c]) * yscale
                    e_raw = abs(p_raw - truth[c])
                    e_sh = abs(p_sh - truth[c])
                    # scipy's pick expressed in the scaled parameterization
                    # (targets y/s: sigma_y and jitter both move by
                    # shift = -2 log10 s); NLL of both picks on the SCALED
                    # targets so the numbers are directly comparable
                    sfv, sth, sjit = picks[c]
                    nll_scipy = _nll_np(
                        d2, ymn[:, c] / yscale,
                        (sth[0], sth[1] + shift), sjit + shift,
                    )
                    nll_grid = _nll_np(
                        d2, ymn[:, c] / yscale, th_g[c], jit_g_sh[c],
                    )
                    # cluster-LU candidate: grid theta, tightest jitter,
                    # np LU solve (mirrors the gated path)
                    maskn = np.ones(d2.shape[0])
                    dqv = d2q.copy()
                    d2min = dqv.min()
                    d2scale = dqv.mean()
                    K_lu = (10.0 ** th_g[c][1]
                            * np.exp(-0.5 * 10.0 ** (-th_g[c][0]) * d2)
                            + np.eye(d2.shape[0]) * 10.0 ** (-20.0 + shift))
                    kq_lu = (10.0 ** th_g[c][1]
                             * np.exp(-0.5 * 10.0 ** (-th_g[c][0]) * d2q))
                    try:
                        p_lu = kq_lu @ np.linalg.solve(
                            K_lu, ymn[:, c] / yscale) * yscale
                        e_lu = abs(p_lu - truth[c])
                    except np.linalg.LinAlgError:
                        e_lu = np.nan
                    print(
                        f"k={k} i={i} c={c} |D|={abs(truth[c]):.2e} "
                        f"oracle th=({sth[0]:6.2f},{sth[1]:7.2f}) "
                        f"jit={sjit:6.1f} nll={nll_scipy:9.2f} err={e_or:.2e}"
                        f" | grid th=({th_g[c][0]:5.2f},{th_g[c][1]:6.2f}) "
                        f"jit_raw={jit_g_raw[c]:6.1f} nll={nll_grid:9.2f} "
                        f"err_raw={e_raw:.2e} err_shift={e_sh:.2e} "
                        f"err_lu={e_lu:.2e} "
                        f"d2rat={d2min/max(d2scale,1e-300):.1e} "
                        f"shift={shift:4.1f}",
                        flush=True,
                    )
            u_next_i = np.where(np.isfinite(preds), preds,
                                np.asarray(uF[i + 1] - uG[i + 1])) + uGn
            u_rows.append(u_next_i)
            uG_rows.append(uGn)

        u_next = jnp.asarray(np.stack(u_rows + [np.asarray(x) for x in []]))
        u_next = jnp.asarray(np.stack(u_rows))
        uG = jnp.asarray(np.stack(uG_rows))
        err = np.max(np.abs(np.asarray(u_next) - np.asarray(u)), axis=1)
        err[I] = 0.0
        u = u_next
        for p in range(I + 1, N + 1):
            if err[p] < eps:
                I += 1
            else:
                break
        print(f"== k={k} I={I}", flush=True)
        if I >= N:
            print("converged at K =", k + 1)
            break


if __name__ == "__main__":
    main()
