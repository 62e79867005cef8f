"""Profile the nnGP-grid sweep internals standalone on the current backend."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp
from jax import lax


def bench(tag, fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fn(*args))
    print(f"{tag}: {(time.perf_counter()-t0)/reps*1000:.1f} ms", flush=True)


def main():
    from nngparareal_tpu.models import NNGParareal, Dataset
    from nngparareal_tpu.ops import gp as gpops
    from nngparareal_tpu.ops.nn_select import nearest_neighbors
    from nngparareal_tpu.ops.linalg_small import (
        cholesky_small, solve_lower_small_mrhs,
    )

    N, n, m, CAP = 32, 128, 18, 1024
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(CAP, n)) * 0.1)
    D = jnp.asarray(rng.normal(size=(CAP, n)) * 1e-4)
    valid = jnp.ones(CAP)
    q = jnp.asarray(rng.normal(size=n) * 0.1)
    ds = Dataset(X, D, valid)
    model = NNGParareal(n=n, N=N, nn=m, optimizer="grid")
    model.k = 5

    xm = X[:m]
    ym = D[:m]
    mask = jnp.ones(m)
    sqd = gpops.pairwise_sq_dists(xm, xm)

    # 1. one shared-grid chol+mrhs eval (576 combos)
    g = jnp.arange(-8.0, 0.0)
    gx, gy = jnp.meshgrid(g, g)
    grid0 = jnp.stack([gx.ravel(), gy.ravel()], axis=1)
    combo_th = jnp.repeat(grid0, 9, axis=0)
    combo_jit = jnp.tile(jnp.arange(-20.0, -11.0), 64)

    @jax.jit
    def grid_nll(Ym):
        def one(th, jp):
            K = gpops.k_se_log10(sqd, th)
            Kj = K + (10.0 ** jp) * jnp.eye(m)
            L = cholesky_small(Kj)
            Z = solve_lower_small_mrhs(L, Ym)
            return 0.5 * jnp.sum(Z * Z, axis=0) + jnp.sum(
                jnp.log(jnp.diag(L))
            )
        return jax.vmap(one)(combo_th, combo_jit)

    bench("1 shared-grid NLL (576 combos, n=128 rhs)", grid_nll, ym)

    # 2. nn select
    @jax.jit
    def sel(q):
        return nearest_neighbors(q, X, valid, m)
    bench("2 top_k select", sel, q)

    # 3. full grid predict (one interval)
    @jax.jit
    def pred(q):
        return model.predict_fn((), ds, q, q, q, None, jnp.asarray(3))
    bench("3 full grid predict (1 interval)", pred, q)

    # 4. refinement block alone (n=128 x 9 single-y NLLs)
    cands = jnp.asarray(rng.uniform(-4, 0, (n, 9, 2)))
    jb = jnp.full((n,), -16.0)

    @jax.jit
    def refine(cands):
        def coord_nll(th_c, jp, y):
            return jax.vmap(
                lambda th: gpops.nll_from_sqd(sqd, y, th, jp, mask,
                                              gpops.k_se_log10)
            )(th_c)
        return jax.vmap(coord_nll)(cands, jb, ym.T)
    bench("4 refine block (128x9 single-y NLL)", refine, cands)

    # 5. posterior block (n=128 per-coord fits)
    th_best = jnp.asarray(rng.uniform(-4, 0, (n, 2)))

    @jax.jit
    def post(th_best):
        sqd_q = gpops.sq_dists_to(q, xm)
        def one(th, jp, j):
            return gpops.predict_mean_from_sqd(
                sqd, sqd_q, jnp.take(ym, j, axis=1), th, jp, mask,
                gpops.k_se_log10,
            )
        return jax.vmap(one)(th_best, jb, jnp.arange(n, dtype=jnp.int32))
    bench("5 posterior (128 coord fits)", post, th_best)

    # 6. scan-of-32 with trivial body
    @jax.jit
    def scan_trivial(U):
        def body(c, u):
            return c, u * 1.0001
        return lax.scan(body, 0.0, U)[1]
    bench("6 scan32 trivial", scan_trivial, jnp.tile(q, (N, 1)))

    # 7. scan-of-32 calling full predict in cond
    @jax.jit
    def scan_pred(I, U):
        def body(c, xs):
            i, u = xs
            def active(_):
                return model.predict_fn((), ds, u, u, u, None, i)
            def frozen(_):
                return jnp.zeros(n)
            return c, lax.cond(i >= I, active, frozen, None)
        return lax.scan(body, 0.0, (jnp.arange(N), U))[1]
    bench("7 scan32 x grid predict", scan_pred, jnp.asarray(1),
          jnp.tile(q, (N, 1)), reps=2)


if __name__ == "__main__":
    main()
