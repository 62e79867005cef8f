"""Fan-out micro-bench on the TPU: layouts and unroll factors."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp

from nngparareal_tpu.systems import Burgers, Hopf
from nngparareal_tpu.ops.rk import make_batched_last_integrator


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
    # Burgers d=128, N=128, 40000 RK8 steps — unroll sweep
    ode = Burgers(d_x=128, normalization="-11")
    f = ode.get_vector_field()
    N = 128
    t0s = jnp.linspace(0.0, 5.9, N, endpoint=False)
    t1s = t0s + 5.9 / N
    U = jnp.tile(jnp.asarray(ode.get_init_cond()), (N, 1))
    for unroll in (1, 4, 8, 16):
        fan = make_batched_last_integrator(f, "RK8", 40000, unroll=unroll)
        bench(f"burgers128 RK8 40k unroll={unroll}", fan, t0s, t1s, U)

    # Hopf d=3, N=512, 100000 RK8 steps (scaled-down scaling config)
    ode2 = Hopf(normalization="-11")
    f2 = ode2.get_vector_field()
    N2 = 512
    t0s2 = jnp.linspace(-20.0, 500.0, N2, endpoint=False)
    t1s2 = t0s2 + 520.0 / N2
    U2 = jnp.tile(jnp.asarray(ode2.get_init_cond()), (N2, 1))
    for unroll in (4, 16):
        fan = make_batched_last_integrator(f2, "RK8", 100000, unroll=unroll)
        bench(f"hopf512 RK8 100k transposed unroll={unroll}", fan,
              t0s2, t1s2, U2)

    # single slice for the serial estimate comparison
    from nngparareal_tpu.ops.rk import make_last_integrator

    one = make_last_integrator(f, "RK8", 40000)
    bench("burgers single-slice 40k", lambda: one(0.0, 5.9 / 128,
                                                  jnp.asarray(ode.get_init_cond())))
    one2 = make_last_integrator(f2, "RK8", 100000)
    bench("hopf single-slice 100k", lambda: one2(-20.0, -20 + 520 / 512,
                                                 jnp.asarray(ode2.get_init_cond())))


if __name__ == "__main__":
    main()
