"""FHN-PDE dx=14 on TPU: fan-out layouts + end-to-end K check."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp

from nngparareal_tpu.systems import FHNPDE
from nngparareal_tpu.solver import RKSolver
from nngparareal_tpu.driver import Parareal
from nngparareal_tpu.ops.rk import make_batched_last_integrator, integrate_last, make_last_integrator


def bench(tag, fn, *args, reps=2):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fn(*args))
    print(f"{tag}: compile+run {c:.2f}s steady {(time.perf_counter()-t0)/reps:.3f}s",
          flush=True)


def main():
    dx = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    mode = sys.argv[2] if len(sys.argv) > 2 else "layout"
    N = 512
    mul = {10: 3, 12: 12, 14: 25, 16: 25}[dx]
    G = {10: "RK2", 12: "RK2", 14: "RK2", 16: "RK4"}[dx]
    T = {10: 150, 12: 550, 14: 950, 16: 1100}[dx]
    Ng_tot = N * mul
    Nf_tot = int(np.ceil(1e8 / Ng_tot) * Ng_tot)
    Ng, Nf = Ng_tot // N, Nf_tot // N
    print(f"dx={dx} d={2*dx*dx} Nf/slice={Nf} Ng/slice={Ng} T={T}", flush=True)

    ode = FHNPDE(d_x=dx, normalization="-11")
    f = ode.get_vector_field()
    steps = min(Nf, 20000)

    if mode == "layout":
        t0s = jnp.linspace(0.0, T, N, endpoint=False)
        t1s = t0s + T / N
        U = jnp.tile(jnp.asarray(ode.get_init_cond()), (N, 1))
        fan = make_batched_last_integrator(f, "RK8", steps)
        bench(f"batch layout ({steps} steps)", fan, t0s, t1s, U)

        fT = jax.vmap(f, in_axes=(0, 1), out_axes=1)
        fanT = jax.jit(lambda t0s, dts, UT: integrate_last(fT, "RK8", t0s, dts, steps, UT))
        bench(f"transposed layout ({steps} steps)", fanT, t0s, (t1s - t0s) / steps, U.T)

        one = make_last_integrator(f, "RK8", steps)
        bench(f"single slice ({steps} steps)",
              lambda: one(0.0, T / N / (Nf / steps), jnp.asarray(ode.get_init_cond())))
        return

    # end-to-end
    solver = RKSolver(f, Ng, Nf, G=G, F="RK8")
    p = Parareal(ode, solver, [0.0, T], N, epsilon=5e-7, verbose=None)
    t0 = time.time()
    out = p.run(model="nngp", nn=20, optimizer="grid",
                early_stop=int(sys.argv[3]) if len(sys.argv) > 3 else None)
    print("K =", out["k"], "converged", out["converged"],
          "conv_int tail", out["conv_int"][-5:], flush=True)
    tm = out["timings"]
    print({k: round(v, 2) for k, v in tm.items() if np.isscalar(v)}, flush=True)
    from nngparareal_tpu.reporting import est_serial, calc_speedup

    print("est_serial", round(est_serial(out, N), 1), "speedup",
          round(calc_speedup(out, N=N), 2), "wall", round(time.time() - t0, 1),
          flush=True)


if __name__ == "__main__":
    main()
