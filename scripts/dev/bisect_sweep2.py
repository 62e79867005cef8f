"""Second-stage bisect: which piece of predict_fn faults inside cond+scan."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def run(tag, fn, *args):
    t0 = time.perf_counter()
    try:
        jax.block_until_ready(fn(*args))
        print(f"{tag}: OK {time.perf_counter()-t0:.2f}s", flush=True)
        return True
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
        return False


def main():
    from nngparareal_tpu.ops import gp as gpops
    from nngparareal_tpu.ops.nn_select import nearest_neighbors
    from nngparareal_tpu.ops.optim import nelder_mead

    N, n, m = 8, 16, 18
    rng = np.random.default_rng(0)
    CAP = 4 * 32
    X = jnp.asarray(rng.normal(size=(CAP, n)) * 0.1)
    D = jnp.asarray(rng.normal(size=(CAP, n)) * 1e-4)
    valid = jnp.ones(CAP)
    U = jnp.asarray(rng.normal(size=(N, n)) * 0.1)
    coords = jnp.asarray(np.repeat(np.arange(n), 9).astype(np.int32))
    jits = jnp.asarray(np.tile(np.arange(-20.0, -11.0), n))
    B = n * 9
    aux = jnp.asarray(rng.integers(-8, 0, (N, B, 2)).astype(float))

    def in_cond_scan(tag, inner):
        @jax.jit
        def f(I, U, aux):
            def body(c, xs):
                i, u, aux_i = xs

                def active(_):
                    return inner(u, aux_i)

                def frozen(_):
                    return jnp.zeros(n)

                out = lax.cond(i >= I, active, frozen, None)
                return c, out

            _, out = lax.scan(body, 0.0, (jnp.arange(N), U, aux))
            return out

        return run(tag, f, jnp.asarray(1), U, aux)

    # a) top_k + gathers
    def inner_a(u, aux_i):
        idx, d2 = nearest_neighbors(u, X, valid, m)
        xm = jnp.take(X, idx, axis=0)
        ym = jnp.take(D, idx, axis=0)
        return xm.sum(0) + ym.sum(0)

    in_cond_scan("a top_k+gather", inner_a)

    # b) + pairwise dists
    def inner_b(u, aux_i):
        idx, d2 = nearest_neighbors(u, X, valid, m)
        xm = jnp.take(X, idx, axis=0)
        sqd = gpops.pairwise_sq_dists(xm, xm)
        return sqd.sum() * jnp.ones(n)

    in_cond_scan("b +pairwise", inner_b)

    # c) + one batched NLL (fixed y, no NM)
    def inner_c(u, aux_i):
        idx, _ = nearest_neighbors(u, X, valid, m)
        xm = jnp.take(X, idx, axis=0)
        ym = jnp.take(D, idx, axis=0)
        mask = jnp.take(valid, idx)
        sqd = gpops.pairwise_sq_dists(xm, xm)
        nll = gpops.nll_from_sqd(sqd, ym[:, 0], jnp.array([-2.0, -1.0]), -16.0,
                                 mask, gpops.k_se_log10)
        return nll * jnp.ones(n)

    in_cond_scan("c +nll", inner_c)

    # d) + coord-take batched NLL over tasks (no NM)
    def inner_d(u, aux_i):
        idx, _ = nearest_neighbors(u, X, valid, m)
        xm = jnp.take(X, idx, axis=0)
        ym = jnp.take(D, idx, axis=0)
        mask = jnp.take(valid, idx)
        sqd = gpops.pairwise_sq_dists(xm, xm)

        def per_task(th, c, jv):
            y = jnp.take(ym, c, axis=1)
            return gpops.nll_from_sqd(sqd, y, th, jv, mask, gpops.k_se_log10)

        fv = jax.vmap(per_task)(aux_i, coords, jits)
        return fv[:n]

    in_cond_scan("d +coordtake", inner_d)

    # e) + NM
    def inner_e(u, aux_i):
        idx, _ = nearest_neighbors(u, X, valid, m)
        xm = jnp.take(X, idx, axis=0)
        ym = jnp.take(D, idx, axis=0)
        mask = jnp.take(valid, idx)
        sqd = gpops.pairwise_sq_dists(xm, xm)

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
        return fv[:n]

    in_cond_scan("e +NM", inner_e)

    # f) + posterior selection (argmin/take_along_axis + posterior mean)
    def inner_f(u, aux_i):
        idx, _ = nearest_neighbors(u, X, valid, m)
        xm = jnp.take(X, idx, axis=0)
        ym = jnp.take(D, idx, axis=0)
        mask = jnp.take(valid, idx)
        sqd = gpops.pairwise_sq_dists(xm, xm)
        sqd_q = gpops.sq_dists_to(u, xm)

        fv = jax.vmap(
            lambda th, c, jv: gpops.nll_from_sqd(
                sqd, jnp.take(ym, c, axis=1), th, jv, mask, gpops.k_se_log10
            )
        )(aux_i, coords, jits)
        per = B // n
        fvr = fv.reshape(n, per)
        thr = aux_i.reshape(n, per, 2)
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

    in_cond_scan("f posterior", inner_f)


if __name__ == "__main__":
    main()
