"""Test the two dodges for the while-in-scan TPU fault:
(a) grid-search hyperopt (straight-line body) inside the scan;
(b) host loop over intervals calling one jitted interval step (NM inside).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp
from jax import lax


def run(tag, fn, *args, reps=1):
    t0 = time.perf_counter()
    try:
        jax.block_until_ready(fn(*args))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(fn(*args))
        r = (time.perf_counter() - t0) / reps
        print(f"{tag}: OK compile+run {c:.2f}s, steady {r:.3f}s", flush=True)
        return True
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)
        return False


def build(N, n, m, CAP, restarts=1):
    from nngparareal_tpu.ops import gp as gpops
    from nngparareal_tpu.ops.nn_select import nearest_neighbors
    from nngparareal_tpu.ops.optim import nelder_mead
    from nngparareal_tpu.ops.rk import integrate_last

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(CAP, n)) * 0.1)
    D = jnp.asarray(rng.normal(size=(CAP, n)) * 1e-4)
    valid = jnp.ones(CAP)
    U = jnp.asarray(rng.normal(size=(N, n)) * 0.1)
    B = n * 9 * restarts
    coords = jnp.asarray(np.repeat(np.arange(n), 9 * restarts).astype(np.int32))
    jits = jnp.asarray(np.tile(np.arange(-20.0, -11.0), n * restarts))
    aux = jnp.asarray(rng.integers(-8, 0, (N, B, 2)).astype(float))

    def f_ode(t, u):
        return -u + 0.1 * jnp.roll(u, 1)

    def select_and_post(u, fv, th, ym, sqd, sqd_q, mask):
        from nngparareal_tpu.ops import gp as gpops

        per = B // n
        fvr = fv.reshape(n, per)
        thr = th.reshape(n, per, 2)
        jvr = jits.reshape(n, per)
        best = jnp.argmin(fvr, axis=1)
        th_best = jnp.take_along_axis(thr, best[:, None, None], 1)[:, 0, :]
        jv_best = jnp.take_along_axis(jvr, best[:, None], 1)[:, 0]

        def post(th_j, jv_j, j):
            return gpops.predict_mean_from_sqd(
                sqd, sqd_q, jnp.take(ym, j, axis=1), th_j, jv_j, mask,
                gpops.k_se_log10,
            )

        return jax.vmap(post)(th_best, jv_best, jnp.arange(n, dtype=jnp.int32))

    def inner_grid(u, aux_i):
        idx, _ = nearest_neighbors(u, X, valid, m)
        xm = jnp.take(X, idx, axis=0)
        ym = jnp.take(D, idx, axis=0)
        mask = jnp.take(valid, idx)
        sqd = gpops.pairwise_sq_dists(xm, xm)
        sqd_q = gpops.sq_dists_to(u, xm)
        # dense 8x8 integer grid (same support as the reference's theta0
        # draws) evaluated in ONE batched NLL call per task
        g = jnp.arange(-8.0, 0.0)
        gx, gy = jnp.meshgrid(g, g)
        grid = jnp.stack([gx.ravel(), gy.ravel()], axis=1)  # (64, 2)

        def per_task(c, jv):
            y = jnp.take(ym, c, axis=1)
            return jax.vmap(
                lambda t: gpops.nll_from_sqd(sqd, y, t, jv, mask,
                                             gpops.k_se_log10)
            )(grid)

        fv_all = jax.vmap(per_task)(coords, jits)  # (B, 64)
        best_g = jnp.argmin(fv_all, axis=1)
        th = grid[best_g]
        fv = jnp.take_along_axis(fv_all, best_g[:, None], 1)[:, 0]
        return select_and_post(u, fv, th, ym, sqd, sqd_q, mask), None

    def inner_nm(u, aux_i):
        idx, _ = nearest_neighbors(u, X, valid, m)
        xm = jnp.take(X, idx, axis=0)
        ym = jnp.take(D, idx, axis=0)
        mask = jnp.take(valid, idx)
        sqd = gpops.pairwise_sq_dists(xm, xm)
        sqd_q = gpops.sq_dists_to(u, xm)

        def obj(pts):
            def per_task(th_c, c, jv):
                return jax.vmap(
                    lambda t: gpops.nll_from_sqd(
                        sqd, jnp.take(ym, c, axis=1), t, jv, mask,
                        gpops.k_se_log10,
                    )
                )(th_c)

            return jax.vmap(per_task)(pts, coords, jits)

        th, fv, _ = nelder_mead(obj, aux_i, max_iters=40, fatol=1e-1, xatol=1e-1)
        return select_and_post(u, fv, th, ym, sqd, sqd_q, mask), None

    def scan_sweep(inner):
        @jax.jit
        def f(I, U, aux):
            def body(c, xs):
                i, u, aux_i = xs

                def active(_):
                    pred, _ = inner(u, aux_i)
                    uGn = integrate_last(f_ode, "RK1", 0.0, 0.01, 4, u)
                    return pred + uGn

                def frozen(_):
                    return jnp.zeros(n)

                out = lax.cond(i >= I, active, frozen, None)
                return c, out

            _, out = lax.scan(body, 0.0, (jnp.arange(N), U, aux))
            return out

        return f

    def host_sweep(inner):
        @jax.jit
        def step(u, aux_i):
            pred, _ = inner(u, aux_i)
            uGn = integrate_last(f_ode, "RK1", 0.0, 0.01, 4, u)
            return pred + uGn

        def f(I, U, aux):
            outs = []
            u = U[0]
            for i in range(N):
                u = step(u, aux[i])
                outs.append(u)
            return jnp.stack(outs)

        return f

    return scan_sweep, host_sweep, inner_grid, inner_nm, U, aux


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "grid32"):
        scan_sweep, _, inner_grid, _, U, aux = build(32, 16, 18, 128)
        run("grid scan N=32", scan_sweep(inner_grid), jnp.asarray(1), U, aux)
    if which in ("all", "grid128"):
        scan_sweep, _, inner_grid, _, U, aux = build(128, 128, 18, 512)
        run("grid scan N=128 n=128", scan_sweep(inner_grid), jnp.asarray(1), U, aux)
    if which in ("all", "host32"):
        _, host_sweep, _, inner_nm, U, aux = build(32, 16, 18, 128)
        run("host NM N=32", host_sweep(inner_nm), jnp.asarray(1), U, aux)


if __name__ == "__main__":
    main()
