"""Find where the Burgers k=0 sweep produces NaN on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp

from nngparareal_tpu.systems import Burgers
from nngparareal_tpu.solver import RKSolver
from nngparareal_tpu.models import NNGParareal, Dataset


def main():
    T, N = 5.9, 128
    ode = Burgers(d_x=128, normalization="-11")
    solver = RKSolver(ode.get_vector_field(), 4, 40000, G="RK1", F="RK8")
    t = np.linspace(0.0, T, N + 1)
    u0 = jnp.asarray(ode.get_init_cond())

    uG = jax.block_until_ready(solver.run_G_chain(jnp.asarray(t), u0))
    print("uG finite:", bool(jnp.all(jnp.isfinite(uG))), "max",
          float(jnp.abs(uG).max()), flush=True)
    u = uG
    uF_tail = jax.block_until_ready(
        solver.run_F_batch(jnp.asarray(t[:-1]), jnp.asarray(t[1:]), u[:-1])
    )
    print("uF finite:", bool(jnp.all(jnp.isfinite(uF_tail))), "max",
          float(jnp.abs(uF_tail).max()), flush=True)
    uF = jnp.concatenate([u[:1], uF_tail])

    X = u[:-1]
    D = uF[1:] - uG[1:]
    print("D absmax", float(jnp.abs(D).max()), flush=True)
    cap = 32 * N
    ds = Dataset.empty(cap, N)
    ds = ds.appended(X, D, jnp.ones(N), 0)
    np.savez("/tmp/burgers_k0.npz", X=np.asarray(X), D=np.asarray(D),
             uG=np.asarray(uG), uF=np.asarray(uF))

    model = NNGParareal(n=N, N=N, nn=18, optimizer="grid")
    model.fit(ds, 0)

    @jax.jit
    def step(u_i, i, uF_ip1, uG_ip1):
        pred = model.predict_fn((), ds, u_i, uF_ip1, uG_ip1, None, i)
        uGn = solver.coarse_step_raw(t[0] + i * (T / N), T / N, u_i)
        return pred, uGn

    dt_slice = T / N
    u_i = uF[1]
    for i in range(1, N):
        pred, uGn = step(u_i, jnp.asarray(i), uF[i + 1], uG[i + 1])
        mp = float(jnp.abs(pred).max())
        mg = float(jnp.abs(uGn).max())
        if not np.isfinite(mp) or not np.isfinite(mg) or mp > 1.0:
            print(f"i={i}: |pred|={mp:.3e} |uGn|={mg:.3e} "
                  f"|u_i|={float(jnp.abs(u_i).max()):.3e}", flush=True)
            np.savez("/tmp/burgers_bad.npz", u_i=np.asarray(u_i), i=i,
                     pred=np.asarray(pred))
            if not np.isfinite(mp) or mp > 100:
                break
        u_i = pred + uGn
    print("done", flush=True)


if __name__ == "__main__":
    main()
