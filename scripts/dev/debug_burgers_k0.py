"""Dissect the Burgers T=5.9 k=0 GP predictions on CPU.

Builds the exact k=0 dataset (coarse init chain, fine fan-out), then runs
the nnGP prediction for each interval the way the sweep would, reporting
prediction magnitudes and — for the worst interval — the NLL landscape
and a scipy Nelder-Mead cross-check.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from nngparareal_tpu.systems import Burgers
from nngparareal_tpu.solver import RKSolver
from nngparareal_tpu.models import NNGParareal, Dataset
from nngparareal_tpu.ops import gp as gpops


def main():
    T = float(sys.argv[1]) if len(sys.argv) > 1 else 5.9
    N = 128
    ode = Burgers(d_x=128, normalization="-11")
    f = ode.get_vector_field()
    solver = RKSolver(f, 4, 40000, G="RK1", F="RK8")
    t = np.linspace(0.0, T, N + 1)
    u0 = jnp.asarray(ode.get_init_cond())

    print("coarse init chain...", flush=True)
    uG = solver.run_G_chain(jnp.asarray(t), u0)
    print("uG max", float(jnp.abs(uG).max()), flush=True)
    u = uG
    import time

    tic = time.time()
    print("fine fan-out (may take a while on CPU)...", flush=True)
    uF_tail = solver.run_F_batch(jnp.asarray(t[:-1]), jnp.asarray(t[1:]), u[:-1])
    print("fanout secs", time.time() - tic, "uF max",
          float(jnp.abs(uF_tail).max()), flush=True)
    uF = jnp.concatenate([u[:1], uF_tail])

    # k=0 dataset: I=1 after the F step; rows i >= 0 valid
    X = u[:-1]
    D = uF[1:] - uG[1:]
    print("D stats: absmax", float(jnp.abs(D).max()), "absmean",
          float(jnp.abs(D).mean()), flush=True)
    cap = 32 * N
    ds = Dataset.empty(cap, N)
    ds = ds.appended(X, D, jnp.ones(N), 0)

    for opt in ("grid", "nm"):
        model = NNGParareal(n=N, N=N, nn=18, optimizer=opt)
        model.fit(ds, 0)
        aux = model.sweep_aux(0, N, cap)

        # u_next[i] during the k=0 sweep: start from u_next[1] = uF[1]
        # and follow the actual recursion
        dt_slice = T / N
        u_i = uF[1]
        worst = (0, 0.0)
        for i in range(1, N):
            aux_i = jax.tree.map(lambda a: a[i], aux) if aux else None
            pred = model.predict_fn((), ds, u_i, uF[i + 1], uG[i + 1],
                                    aux_i, jnp.asarray(i))
            uGn = solver.coarse_step_raw(t[i], dt_slice, u_i)
            u_next = pred + uGn
            mx = float(jnp.abs(pred).max())
            if mx > worst[1]:
                worst = (i, mx)
            if not np.isfinite(mx) or mx > 2.0:
                print(f"[{opt}] i={i}: |pred|max={mx:.3e} "
                      f"|uGn|max={float(jnp.abs(uGn).max()):.3e}", flush=True)
                if mx > 50 or not np.isfinite(mx):
                    break
            u_i = u_next
        print(f"[{opt}] worst interval {worst[0]} |pred|max={worst[1]:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
