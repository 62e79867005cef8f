"""Third-stage bisect: NM+posterior combined, then growing sizes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
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


def full_predict_case(tag, N, n, m, CAP, restarts=1, coarse=False,
                      coarse_steps=4):
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

    def inner(u, aux_i):
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

        pred = jax.vmap(post)(th_best, jv_best, jnp.arange(n, dtype=jnp.int32))
        if coarse:
            uGn = integrate_last(f_ode, "RK1", 0.0, 0.01, coarse_steps, u)
            return pred + uGn
        return pred

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


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "g"):
        full_predict_case("g NM+posterior small", N=8, n=16, m=18, CAP=128)
    if which in ("all", "h"):
        full_predict_case("h +coarse", N=8, n=16, m=18, CAP=128, coarse=True)
    if which in ("all", "i"):
        full_predict_case("i bigger N", N=32, n=16, m=18, CAP=128, coarse=True)
    if which in ("all", "j"):
        full_predict_case("j n=128", N=8, n=128, m=18, CAP=512, coarse=True)


if __name__ == "__main__":
    main()
