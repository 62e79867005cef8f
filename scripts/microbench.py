"""Micro-benchmarks of the three fused kernels on the current backend.

Usage: python scripts/microbench.py [burgers|hopf] [N]
Reports wall times of: fine fan-out, coarse chain, one fused nnGP sweep,
single-slice fine (serial estimator), and batched small-Cholesky NLL.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

try:
    from nngparareal_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache(verbose=True)
except Exception as _e:
    print(f"[compile-cache] enable failed: {_e!r}", flush=True)


def timeit(fn, *args, reps=3):
    # sync via host fetch: through the axon relay block_until_ready can
    # return ~0s for some executables (round-2 anomaly); fetching one leaf
    # to host is the sync the relay cannot elide.
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps, out


def main():
    from nngparareal_tpu.systems import Burgers, Hopf
    from nngparareal_tpu.systems.configs import Config
    from nngparareal_tpu.solver import RKSolver
    from nngparareal_tpu.models import NNGParareal, Dataset
    from nngparareal_tpu.driver import Parareal

    which = sys.argv[1] if len(sys.argv) > 1 else "burgers"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    if which == "burgers":
        ode = Burgers(d_x=128, normalization="-11")
        solver = RKSolver(ode.get_vector_field(), 4, 40000, G="RK1", F="RK8")
        tspan = (0.0, 5.9)
        nn = 18
    else:
        ode = Hopf(normalization="-11")
        cfg = Config(ode, N=N).get()
        solver = RKSolver(
            ode.get_vector_field(), cfg["Ng"], cfg["Nf"] * 10000,
            G=cfg["G"], F=cfg["F"],
        )
        tspan = tuple(cfg["tspan"])
        nn = 15

    n = ode.get_dim()
    t = jnp.linspace(tspan[0], tspan[1], N + 1)
    u0 = jnp.asarray(ode.get_init_cond())
    U = jnp.tile(u0, (N, 1))

    dt, _ = timeit(solver.run_F_batch, t[:-1], t[1:], U, reps=2)
    print(f"fine fan-out ({N} slices x {solver.Nf} steps): {dt:.3f}s")

    dt, _ = timeit(lambda: solver.run_F(float(t[0]), float(t[1]), u0), reps=2)
    print(f"single-slice fine ({solver.Nf} steps):        {dt:.3f}s")

    dt, uG = timeit(lambda: solver.run_G_chain(t, u0), reps=2)
    print(f"coarse chain ({N} x {solver.Ng} steps):        {dt:.3f}s")

    # one fused sweep with a realistic dataset
    p = Parareal(ode, solver, tspan, N, verbose=None)
    model = NNGParareal(n=n, N=N, nn=nn)
    ds = Dataset.empty(8 * N, n)
    rng = np.random.default_rng(0)
    ds = ds.appended(
        jnp.asarray(rng.normal(size=(4 * N, n)) * 0.1),
        jnp.asarray(rng.normal(size=(4 * N, n)) * 1e-4),
        jnp.ones(4 * N), 0,
    )
    model.fit(ds, 4)
    aux = model.sweep_aux(4, N)
    sweep = p._make_sweep(model, ds.capacity)
    args = (
        jnp.asarray(1), jnp.asarray(uG), jnp.asarray(uG), jnp.asarray(uG),
        jnp.asarray(uG), jnp.asarray(uG), ds.X, ds.D, ds.valid,
        model.state_pytree(), aux,
    )
    t0 = time.perf_counter()
    out = sweep(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # relay-proof sync
    print(f"sweep compile+run:                          {time.perf_counter()-t0:.3f}s")
    dt, _ = timeit(lambda: sweep(*args), reps=2)
    print(f"fused nnGP sweep ({N} intervals):           {dt:.3f}s")

    # batched tiny-cholesky NLL (the NM inner op)
    from nngparareal_tpu.ops import gp as gpops

    B, m = n * 9 * 6, nn
    X = jnp.asarray(rng.normal(size=(m, n)))
    sqd = gpops.pairwise_sq_dists(X, X)
    ys = jnp.asarray(rng.normal(size=(B, m)))
    ths = jnp.asarray(rng.uniform(-4, 0, size=(B, 2)))

    @jax.jit
    def batch_nll(ys, ths):
        return jax.vmap(
            lambda y, th: gpops.nll_from_sqd(
                sqd, y, th, -16.0, jnp.ones(m), gpops.k_se_log10
            )
        )(ys, ths)

    dt, _ = timeit(batch_nll, ys, ths, reps=5)
    print(f"batched NLL ({B} tasks, m={m}):             {dt*1000:.2f}ms")


if __name__ == "__main__":
    main()
