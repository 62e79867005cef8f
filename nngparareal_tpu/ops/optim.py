"""Batched, jittable Nelder-Mead — the on-device replacement for the
reference's process-pool fan-out of ``scipy.optimize.minimize`` calls
(reference models.py:254-260, 332-338).

The reference solves thousands of independent tiny (D=2) simplex searches
per parareal iteration — one per (state coordinate x jitter x restart)
GP-hyperparameter task — by shipping each to an MPI worker. Here all B
searches advance in lockstep inside one ``lax.while_loop``: every iteration
evaluates all candidate points of all simplexes (reflection, expansion,
both contractions and the D shrink points) in a single batched objective
call, which the GP objective turns into one batched Cholesky — exactly the
shape the MXU wants. Convergence uses scipy's simultaneous fatol/xatol
criterion per simplex; converged simplexes freeze in place so results match
scipy's stopping behaviour.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _init_simplex(x0):
    """scipy-style initial simplex: perturb each coordinate by 5% (or
    2.5e-4 if it is zero). x0: (B, D) -> (B, D+1, D)."""
    B, D = x0.shape
    sim = jnp.broadcast_to(x0[:, None, :], (B, D + 1, D))
    eye = jnp.eye(D, dtype=x0.dtype)
    pert = jnp.where(x0 == 0.0, 2.5e-4, 0.05 * x0)  # (B, D)
    deltas = pert[:, :, None] * eye[None, :, :]  # (B, D, D)
    sim = sim.at[:, 1:, :].add(deltas)
    return sim


def nelder_mead(obj_fn, x0, max_iters=200, fatol=1e-4, xatol=1e-4):
    """Minimise obj_fn over B independent simplexes.

    obj_fn: (B, C, D) -> (B, C) batched objective — B tasks (each with its
            own data, e.g. its coordinate/jitter), C candidate points per
            task. Must be vmap-compatible over both axes; NaNs are mapped
            to +inf here.
    x0:     (B, D) initial points.
    Returns (x_best (B, D), f_best (B,), iters_used (int32)).
    """
    x0 = jnp.asarray(x0)
    B, D = x0.shape
    rho, chi, psi, sigma = 1.0, 2.0, 0.5, 0.5

    def evaluate(pts):
        f = obj_fn(pts)
        return jnp.where(jnp.isnan(f), jnp.inf, f)

    sim = _init_simplex(x0)
    fvals = evaluate(sim)

    def sort_simplex(sim, fvals):
        order = jnp.argsort(fvals, axis=1, stable=True)
        sim = jnp.take_along_axis(sim, order[:, :, None], axis=1)
        fvals = jnp.take_along_axis(fvals, order, axis=1)
        return sim, fvals

    sim, fvals = sort_simplex(sim, fvals)

    def converged_mask(sim, fvals):
        x_spread = jnp.max(
            jnp.abs(sim[:, 1:, :] - sim[:, :1, :]), axis=(1, 2)
        )
        f_spread = jnp.max(jnp.abs(fvals[:, 1:] - fvals[:, :1]), axis=1)
        return (x_spread <= xatol) & (f_spread <= fatol)

    def cond(state):
        _, _, it, done = state
        return (it < max_iters) & (~jnp.all(done))

    def body(state):
        sim, fvals, it, done = state
        best = sim[:, 0, :]
        worst = sim[:, -1, :]
        f0 = fvals[:, 0]
        fsw = fvals[:, -2]
        fw = fvals[:, -1]
        xbar = jnp.mean(sim[:, :-1, :], axis=1)

        xr = (1 + rho) * xbar - rho * worst
        xe = (1 + rho * chi) * xbar - rho * chi * worst
        xc = (1 + psi * rho) * xbar - psi * rho * worst
        xcc = (1 - psi) * xbar + psi * worst
        shrunk = best[:, None, :] + sigma * (sim[:, 1:, :] - best[:, None, :])

        cands = jnp.concatenate(
            [xr[:, None], xe[:, None], xc[:, None], xcc[:, None], shrunk],
            axis=1,
        )  # (B, 4+D, D)
        fcands = evaluate(cands)
        fxr, fxe, fxc, fxcc = (
            fcands[:, 0],
            fcands[:, 1],
            fcands[:, 2],
            fcands[:, 3],
        )
        f_shrunk = fcands[:, 4:]

        # reflection / expansion
        take_xe = (fxr < f0) & (fxe < fxr)
        cand_refl = jnp.where(take_xe[:, None], xe, xr)
        f_refl = jnp.where(take_xe, fxe, fxr)
        accept_refl = fxr < fsw

        # contraction
        outside = fxr < fw
        cand_con = jnp.where(outside[:, None], xc, xcc)
        f_con = jnp.where(outside, fxc, fxcc)
        con_ok = jnp.where(outside, fxc <= fxr, fxcc < fw)

        do_shrink = (~accept_refl) & (~con_ok)
        new_pt = jnp.where(accept_refl[:, None], cand_refl, cand_con)
        f_new = jnp.where(accept_refl, f_refl, f_con)

        sim_replace = sim.at[:, -1, :].set(new_pt)
        f_replace = fvals.at[:, -1].set(f_new)

        sim_shrink = jnp.concatenate([sim[:, :1, :], shrunk], axis=1)
        f_shrink = jnp.concatenate([fvals[:, :1], f_shrunk], axis=1)

        sim_next = jnp.where(do_shrink[:, None, None], sim_shrink, sim_replace)
        f_next = jnp.where(do_shrink[:, None], f_shrink, f_replace)

        sim_next, f_next = sort_simplex(sim_next, f_next)

        # freeze converged simplexes (scipy would have returned already)
        keep = done[:, None, None]
        sim_out = jnp.where(keep, sim, sim_next)
        f_out = jnp.where(done[:, None], fvals, f_next)
        done_next = done | converged_mask(sim_out, f_out)
        return sim_out, f_out, it + 1, done_next

    done0 = converged_mask(sim, fvals)
    sim, fvals, iters, _ = lax.while_loop(
        cond, body, (sim, fvals, jnp.int32(0), done0)
    )
    return sim[:, 0, :], fvals[:, 0], iters


def grid_search(obj_fn, grid):
    """Dense jittable argmin over a candidate grid, per task.

    obj_fn: (B, G, D) -> (B, G); grid: (B, G, D).
    Returns (x_best (B, D), f_best (B,)). Offered as a cheaper
    deterministic alternative to Nelder-Mead for theta selection
    (BASELINE.json north star suggests a dense search).
    """
    f = obj_fn(grid)
    f = jnp.where(jnp.isnan(f), jnp.inf, f)
    i = jnp.argmin(f, axis=1)
    x_best = jnp.take_along_axis(grid, i[:, None, None], axis=1)[:, 0, :]
    f_best = jnp.take_along_axis(f, i[:, None], axis=1)[:, 0]
    return x_best, f_best


def nelder_mead_fixed(obj_fn, x0, iters=40, fatol=0.0, xatol=0.0):
    """Fixed-iteration batched Nelder-Mead (lax.fori_loop, no while_loop).

    Same lockstep simplex algorithm as ``nelder_mead`` but with a static
    iteration count, which makes it safe to nest inside long ``lax.scan``
    sweeps on TPU toolchains where a nested while_loop miscompiles (the
    reason the driver's NM mode needs a host sweep there). Converged
    simplexes freeze in place, so extra iterations are no-ops rather than
    drift. Used as the continuous polish stage of the grid hyperopt: a
    deterministic start (the grid argmin) + NM's continuous descent gives
    scipy-NM solution quality without random restarts.
    """
    x0 = jnp.asarray(x0)
    B, D = x0.shape
    rho, chi, psi, sigma = 1.0, 2.0, 0.5, 0.5

    def evaluate(pts):
        f = obj_fn(pts)
        return jnp.where(jnp.isnan(f), jnp.inf, f)

    sim = _init_simplex(x0)
    fvals = evaluate(sim)

    def sort_simplex(sim, fvals):
        order = jnp.argsort(fvals, axis=1, stable=True)
        sim = jnp.take_along_axis(sim, order[:, :, None], axis=1)
        fvals = jnp.take_along_axis(fvals, order, axis=1)
        return sim, fvals

    sim, fvals = sort_simplex(sim, fvals)

    def converged_mask(sim, fvals):
        x_spread = jnp.max(jnp.abs(sim[:, 1:, :] - sim[:, :1, :]), axis=(1, 2))
        f_spread = jnp.max(jnp.abs(fvals[:, 1:] - fvals[:, :1]), axis=1)
        return (x_spread <= xatol) & (f_spread <= fatol)

    def body(_, state):
        sim, fvals, done = state
        best = sim[:, 0, :]
        worst = sim[:, -1, :]
        f0 = fvals[:, 0]
        fsw = fvals[:, -2]
        fw = fvals[:, -1]
        xbar = jnp.mean(sim[:, :-1, :], axis=1)

        xr = (1 + rho) * xbar - rho * worst
        xe = (1 + rho * chi) * xbar - rho * chi * worst
        xc = (1 + psi * rho) * xbar - psi * rho * worst
        xcc = (1 - psi) * xbar + psi * worst
        shrunk = best[:, None, :] + sigma * (sim[:, 1:, :] - best[:, None, :])

        cands = jnp.concatenate(
            [xr[:, None], xe[:, None], xc[:, None], xcc[:, None], shrunk],
            axis=1,
        )
        fcands = evaluate(cands)
        fxr, fxe, fxc, fxcc = (
            fcands[:, 0], fcands[:, 1], fcands[:, 2], fcands[:, 3],
        )
        f_shrunk = fcands[:, 4:]

        take_xe = (fxr < f0) & (fxe < fxr)
        cand_refl = jnp.where(take_xe[:, None], xe, xr)
        f_refl = jnp.where(take_xe, fxe, fxr)
        accept_refl = fxr < fsw

        outside = fxr < fw
        cand_con = jnp.where(outside[:, None], xc, xcc)
        f_con = jnp.where(outside, fxc, fxcc)
        con_ok = jnp.where(outside, fxc <= fxr, fxcc < fw)

        do_shrink = (~accept_refl) & (~con_ok)
        new_pt = jnp.where(accept_refl[:, None], cand_refl, cand_con)
        f_new = jnp.where(accept_refl, f_refl, f_con)

        sim_replace = sim.at[:, -1, :].set(new_pt)
        f_replace = fvals.at[:, -1].set(f_new)
        sim_shrink = jnp.concatenate([sim[:, :1, :], shrunk], axis=1)
        f_shrink = jnp.concatenate([fvals[:, :1], f_shrunk], axis=1)

        sim_next = jnp.where(do_shrink[:, None, None], sim_shrink, sim_replace)
        f_next = jnp.where(do_shrink[:, None], f_shrink, f_replace)
        sim_next, f_next = sort_simplex(sim_next, f_next)

        keep = done[:, None, None]
        sim_out = jnp.where(keep, sim, sim_next)
        f_out = jnp.where(done[:, None], fvals, f_next)
        done_next = done | converged_mask(sim_out, f_out)
        return sim_out, f_out, done_next

    done0 = converged_mask(sim, fvals)
    sim, fvals, _ = lax.fori_loop(0, int(iters), body, (sim, fvals, done0))
    return sim[:, 0, :], fvals[:, 0]
