"""Small-N degenerate-shape probe (VERDICT r3 item 5 / NOTES r3 item 4).

The Hopf scaling rows at N<=128 are wall-pathological on one chip: the
per-slice step count grows as 1/N at fixed total work, and the packed
(3, 1, 128) layout runs its multi-million-step fori_loop on 1/8-filled
vregs — measured 2-20x slower than the same program at (3, 4, 128),
varying per process. This probe times the candidate mitigations at the
REAL Hopf scaling shapes so the production rows use the measured winner:

  * packed        — current default layout, rows = ceil(B/128)
  * packed mr8    — min_rows=8: pad the batch into full (8,128) sublane
                    tiles (8x redundant lanes at N=32, full-tile ops)
  * transposed    — pack=False flat (dim, B) layout
  * unroll4       — packed + fori_loop unroll=4

Steps are truncated to PROBE_STEPS (default 2e5) of the true per-slice
count; us/step extrapolates. Timing sync is a host fetch (the relay can
elide block_until_ready).

Usage: python scripts/smalln_probe.py [N ...]   (default 32 64 128)
Appends rows to results/smalln_probe.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SMALLN_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from nngparareal_tpu.systems import Hopf
from nngparareal_tpu.systems.configs import Config
from nngparareal_tpu.ops.rk import make_batched_last_integrator
from nngparareal_tpu.ops.rk_ds import make_batched_last_integrator_ds

PROBE_STEPS = int(os.environ.get("PROBE_STEPS", 200_000))
OUT = "results/smalln_probe.json"


def timeit(fan, t0s, t1s, U, reps=2):
    np.asarray(fan(t0s, t1s, U))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fan(t0s, t1s, U))
        best = min(best, time.perf_counter() - t0)
    return best


def burgers_small_b(rows):
    """Burgers fan-out wall vs batch size B in {8, 32, 128} for all three
    fine paths: quantifies the 8-slice wall that bounds the bench's
    own-serial speedup (BENCHMARKS.md 'On the S column'; VERDICT r3 weak
    #2). d=128 runs the row-major layout, so min_rows does not apply —
    the question is pure dependency-chain latency vs batch width."""
    from nngparareal_tpu.systems import Burgers
    from nngparareal_tpu.ops.rk_pallas import make_pallas_fanout_ds

    ode = Burgers(d_x=128, normalization="-11")
    f = ode.get_vector_field()
    fds = ode.get_ds_vector_field()
    steps = min(PROBE_STEPS, 40000)
    dt_tot = (5.9 / 128) * (steps / 40000)
    for B in (8, 32, 128):
        t0s = jnp.zeros(B)
        t1s = jnp.full(B, dt_tot)
        U = jnp.tile(jnp.asarray(ode.get_init_cond()), (B, 1))
        variants = {
            "burgers_f64": make_batched_last_integrator(f, "RK8", steps),
            "burgers_ds": make_batched_last_integrator_ds(fds, "RK8",
                                                          steps),
            "burgers_pallas": make_pallas_fanout_ds(fds, "RK8", steps),
        }
        for name, fan in variants.items():
            try:
                wall = timeit(fan, t0s, t1s, U)
                row = {"N": B, "variant": name, "steps": steps,
                       "wall_s": round(wall, 4),
                       "us_per_step": round(wall / steps * 1e6, 3),
                       "backend": jax.default_backend()}
            except Exception as e:
                row = {"N": B, "variant": name, "steps": steps,
                       "error": str(e)[:200],
                       "backend": jax.default_backend()}
            print(row, flush=True)
            rows.append(row)
            json.dump(rows, open(OUT, "w"), indent=1)


def main():
    args = sys.argv[1:]
    do_burgers = "burgers" in args
    Ns = [int(a) for a in args if a != "burgers"] or (
        [] if do_burgers else [32, 64, 128])
    rows = []
    if os.path.exists(OUT):
        rows = json.load(open(OUT))
    if do_burgers:
        os.makedirs("results", exist_ok=True)
        burgers_small_b(rows)
    ode = Hopf(normalization="-11")
    f = ode.get_vector_field()
    fds = ode.get_ds_vector_field()
    for N in Ns:
        cfg = Config(ode, N=N).get()
        true_steps = (cfg["Nf"] * 10000) // N  # scaling driver Nf x1e4
        steps = min(PROBE_STEPS, true_steps)
        t0s = jnp.linspace(0.0, 1.0, N, endpoint=False)
        t1s = t0s + steps * (cfg["tspan"][1] / (cfg["Nf"] * 10000))
        U = jnp.tile(jnp.asarray(ode.get_init_cond()), (N, 1))
        variants = {
            "ds_packed": make_batched_last_integrator_ds(
                fds, cfg["F"], steps, pack=True),
            "ds_packed_mr8": make_batched_last_integrator_ds(
                fds, cfg["F"], steps, pack=True, min_rows=8),
            "ds_transposed": make_batched_last_integrator_ds(
                fds, cfg["F"], steps, pack=False),
            "ds_packed_unroll4": make_batched_last_integrator_ds(
                fds, cfg["F"], steps, pack=True, unroll=4),
            "f64_packed": make_batched_last_integrator(
                f, cfg["F"], steps, pack=True),
            "f64_packed_mr8": make_batched_last_integrator(
                f, cfg["F"], steps, pack=True, min_rows=8),
        }
        for name, fan in variants.items():
            try:
                wall = timeit(fan, t0s, t1s, U)
                row = {"N": N, "variant": name, "steps": steps,
                       "wall_s": round(wall, 4),
                       "us_per_step": round(wall / steps * 1e6, 3),
                       "est_full_slice_s": round(
                           wall / steps * true_steps, 1),
                       "backend": jax.default_backend()}
            except Exception as e:
                row = {"N": N, "variant": name, "steps": steps,
                       "error": str(e)[:200],
                       "backend": jax.default_backend()}
            print(row, flush=True)
            rows.append(row)
            os.makedirs("results", exist_ok=True)
            json.dump(rows, open(OUT, "w"), indent=1)


if __name__ == "__main__":
    main()
