"""Bisect which part of the fused sweep faults the TPU."""

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
        out = jax.block_until_ready(fn(*args))
        print(f"{tag}: OK {time.perf_counter()-t0:.2f}s", flush=True)
        return True
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        return False


def main():
    from nngparareal_tpu.systems import Burgers
    from nngparareal_tpu.solver import RKSolver
    from nngparareal_tpu.ops import gp as gpops
    from nngparareal_tpu.ops.nn_select import nearest_neighbors
    from nngparareal_tpu.ops.optim import nelder_mead

    N, n, m = 32, 16, 18
    ode = Burgers(d_x=n, normalization="-11")
    solver = RKSolver(ode.get_vector_field(), 4, 100, G="RK1", F="RK8")
    rng = np.random.default_rng(0)
    CAP = 4 * N
    X = jnp.asarray(rng.normal(size=(CAP, n)) * 0.1)
    D = jnp.asarray(rng.normal(size=(CAP, n)) * 1e-4)
    valid = jnp.ones(CAP)
    q = jnp.asarray(rng.normal(size=n) * 0.1)

    # 1. scan + cond + coarse step (bare sweep core)
    @jax.jit
    def bare_sweep(I, U):
        def body(u, xs):
            i, u_init = xs

            def active(u):
                return solver.coarse_step_raw(0.0, 0.1, u)

            def frozen(u):
                return u_init

            u2 = lax.cond(i >= I, active, frozen, u)
            return u2, u2

        _, out = lax.scan(body, U[0], (jnp.arange(N), U))
        return out

    run("1 scan+cond+coarse", bare_sweep, jnp.asarray(1), jnp.tile(q, (N, 1)))

    # 2. top_k neighbour selection
    @jax.jit
    def nnsel(q):
        idx, d2 = nearest_neighbors(q, X, valid, m)
        return idx, d2

    run("2 top_k", nnsel, q)

    # 3. batched NLL (vmap^2 cholesky)
    sqd = gpops.pairwise_sq_dists(X[:m], X[:m])

    @jax.jit
    def batch_nll(ths):
        def per_task(th_c):
            return jax.vmap(
                lambda t: gpops.nll_from_sqd(
                    sqd, D[:m, 0], t, -16.0, jnp.ones(m), gpops.k_se_log10
                )
            )(th_c)

        return jax.vmap(per_task)(ths)

    ths = jnp.asarray(rng.uniform(-4, 0, size=(9, 6, 2)))
    run("3 batched NLL", batch_nll, ths)

    # 4. Nelder-Mead while_loop around it
    @jax.jit
    def nm(ths0):
        def obj(pts):
            def per_task(th_c):
                return jax.vmap(
                    lambda t: gpops.nll_from_sqd(
                        sqd, D[:m, 0], t, -16.0, jnp.ones(m), gpops.k_se_log10
                    )
                )(th_c)

            return jax.vmap(per_task)(pts)

        th, fv, it = nelder_mead(obj, ths0, max_iters=60, fatol=1e-1, xatol=1e-1)
        return th, fv

    run("4 NM while_loop", nm, jnp.asarray(rng.integers(-8, 0, (9, 2)).astype(float)))

    # 5. NM inside scan
    @jax.jit
    def nm_in_scan(ths0):
        def body(c, th0):
            def obj(pts):
                def per_task(th_c):
                    return jax.vmap(
                        lambda t: gpops.nll_from_sqd(
                            sqd, D[:m, 0], t, -16.0, jnp.ones(m),
                            gpops.k_se_log10,
                        )
                    )(th_c)

                return jax.vmap(per_task)(pts)

            th, fv, _ = nelder_mead(obj, th0, max_iters=40, fatol=1e-1, xatol=1e-1)
            return c, fv

        _, out = lax.scan(body, 0.0, ths0)
        return out

    run("5 NM in scan", nm_in_scan,
        jnp.asarray(rng.integers(-8, 0, (4, 9, 2)).astype(float)))

    # 6. NM inside cond inside scan
    @jax.jit
    def nm_in_cond_scan(ths0):
        def body(c, xs):
            i, th0 = xs

            def active(_):
                def obj(pts):
                    def per_task(th_c):
                        return jax.vmap(
                            lambda t: gpops.nll_from_sqd(
                                sqd, D[:m, 0], t, -16.0, jnp.ones(m),
                                gpops.k_se_log10,
                            )
                        )(th_c)

                    return jax.vmap(per_task)(pts)

                _, fv, _ = nelder_mead(obj, th0, max_iters=40, fatol=1e-1,
                                       xatol=1e-1)
                return fv

            def frozen(_):
                return jnp.zeros(th0.shape[0])

            fv = lax.cond(i >= 1, active, frozen, None)
            return c, fv

        _, out = lax.scan(body, 0.0, (jnp.arange(4), ths0))
        return out

    run("6 NM in cond+scan", nm_in_cond_scan,
        jnp.asarray(rng.integers(-8, 0, (4, 9, 2)).astype(float)))

    # 7. full nnGP predict inside scan+cond
    from nngparareal_tpu.models import NNGParareal, Dataset

    model = NNGParareal(n=n, N=N, nn=m)
    model.k = 3
    ds = Dataset(X, D, valid)
    aux = model.sweep_aux(3, N)

    @jax.jit
    def predict_scan(I, U, aux):
        def body(u, xs):
            i, u_init, aux_i = xs

            def active(u):
                uGn = solver.coarse_step_raw(0.0, 0.1, u)
                pred = model.predict_fn((), ds, u, u_init, u_init, aux_i)
                return pred + uGn

            def frozen(u):
                return u_init

            u2 = lax.cond(i >= I, active, frozen, u)
            return u2, u2

        _, out = lax.scan(body, U[0], (jnp.arange(N), U, aux))
        return out

    run("7 full predict sweep", predict_scan, jnp.asarray(1),
        jnp.tile(q, (N, 1)), aux)


if __name__ == "__main__":
    main()
