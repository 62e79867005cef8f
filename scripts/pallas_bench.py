"""On-chip A/B of the three fine fan-out paths: f64 XLA, ds32 XLA, Pallas.

Correctness: Pallas vs the ds32 vmap fan-out (same arithmetic, must agree
to ~1e-11) and both vs emulated f64. Timing: steady-state wall per
fan-out on the production shapes:

  * Burgers d=128, B=128, RK8, 40 000 steps   (bench.py headline)
  * Hopf    d=3,   B=512, RK8, 200 000 steps  (scaled-down probe of the
    3.4e6-step production fan-out; per-step cost is what matters)
  * TomLab  d=3,   B=512, RK4, 200 000 steps

Prints one dict per (system, path).
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

from nngparareal_tpu.systems import Burgers, Hopf, ThomasLabyrinth
from nngparareal_tpu.ops.rk import make_batched_last_integrator
from nngparareal_tpu.ops.rk_ds import make_batched_last_integrator_ds
from nngparareal_tpu.ops.rk_pallas import make_pallas_fanout_ds


def bench(run, t0s, t1s, U, reps=3):
    # sync via host fetch, not block_until_ready: through the axon relay
    # block_until_ready has been observed returning ~0s for some
    # executables (round-2 "0.000s" anomaly) — a device->host transfer of
    # the result is the one sync the relay cannot elide, and at these
    # shapes (<=512x128 f64) it costs microseconds.
    out = np.asarray(run(t0s, t1s, U))  # compile + warm
    times = []
    for _ in range(reps):
        tic = time.perf_counter()
        out = np.asarray(run(t0s, t1s, U))
        times.append(time.perf_counter() - tic)
    return out, min(times)


def main():
    cases = [
        ("Burgers", Burgers(d_x=128, normalization="-11"), 128, "RK8", 40000),
        ("Hopf", Hopf(normalization="-11"), 512, "RK8", 200000),
        ("TomLab", ThomasLabyrinth(normalization="-11"), 512, "RK4", 200000),
    ]
    sel = set(sys.argv[1:])
    for name, ode, B, tab, steps in cases:
        if sel and name not in sel:
            continue
        d = ode.get_dim()
        f64 = ode.get_vector_field()
        fds = ode.get_ds_vector_field()
        rng = np.random.default_rng(0)
        U = jnp.asarray(ode.get_init_cond())[None, :] + 0.01 * jnp.asarray(
            rng.uniform(-1, 1, (B, d))
        )
        t0s = jnp.zeros(B)
        t1s = jnp.full(B, 0.2)

        out64, t_64 = bench(
            make_batched_last_integrator(f64, tab, steps, pack=False),
            t0s, t1s, U
        )
        outds, t_ds = bench(
            make_batched_last_integrator_ds(fds, tab, steps, pack=False),
            t0s, t1s, U
        )
        # lane-packed layouts (the small-d default since round 3): each
        # per-coordinate row fills whole (8, 128) vregs
        out64p, t_64p = bench(
            make_batched_last_integrator(f64, tab, steps, pack=True),
            t0s, t1s, U
        )
        outdsp, t_dsp = bench(
            make_batched_last_integrator_ds(fds, tab, steps, pack=True),
            t0s, t1s, U
        )
        outpl, t_pl = bench(
            make_pallas_fanout_ds(fds, tab, steps), t0s, t1s, U
        )
        scale = max(1.0, float(np.abs(out64).max()))
        print({
            "system": name, "B": B, "d": d, "steps": steps, "tab": tab,
            "t_f64_s": round(t_64, 3), "t_ds_s": round(t_ds, 3),
            "t_f64_packed_s": round(t_64p, 3),
            "t_ds_packed_s": round(t_dsp, 3),
            "t_pallas_s": round(t_pl, 3),
            "us_per_step": {
                "f64": round(1e6 * t_64 / steps, 2),
                "ds": round(1e6 * t_ds / steps, 2),
                "f64_packed": round(1e6 * t_64p / steps, 2),
                "ds_packed": round(1e6 * t_dsp / steps, 2),
                "pallas": round(1e6 * t_pl / steps, 2),
            },
            "rel_dev_ds_vs_f64": float(np.abs(outds - out64).max() / scale),
            "rel_dev_f64packed_vs_f64": float(
                np.abs(out64p - out64).max() / scale),
            "rel_dev_dspacked_vs_ds": float(
                np.abs(outdsp - outds).max() / scale),
            "rel_dev_pallas_vs_ds": float(np.abs(outpl - outds).max() / scale),
        }, flush=True)


if __name__ == "__main__":
    main()
