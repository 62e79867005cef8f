"""Oracle-compare a LATE-iteration Hopf front-interval prediction:
our grid vs independent scipy-NM on identical (xm, ym, q), vs truth."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from nngparareal_tpu import Hopf, Config, RKSolver, Parareal
from nngparareal_tpu.models import NNGParareal, Dataset
from nngparareal_tpu.ops.nn_select import nearest_neighbors
from hopf_pred_quality import scipy_nngp_predict


def main():
    N, nn = 32, 15
    K_STOP = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ode = Hopf(normalization="-11")
    cfg = Config(ode, N=N).get()
    solver = RKSolver(ode.get_vector_field(), cfg["Ng"], cfg["Nf"],
                      G=cfg["G"], F=cfg["F"])
    p = Parareal(ode, solver, cfg["tspan"], N, epsilon=5e-7, verbose=None)
    out = p.run(model="nngp", nn=nn, optimizer="grid", early_stop=K_STOP,
                keep_history=True)
    I = out["conv_int"][-1]
    print("after k =", out["k"], "I =", I, "conv_int", out["conv_int"])

    # rebuild dataset exactly as the run left it
    x, D = out["x"], out["D"]
    cap = 32 * N
    ds = Dataset.empty(cap, 3)
    # rows were appended iteration-major with masks; the saved x/D are the
    # valid rows in order — re-append as one valid block (the GP only sees
    # valid rows, order within the buffer is irrelevant to selection)
    ds = ds.appended(jnp.asarray(x), jnp.asarray(D),
                     jnp.ones(x.shape[0]), 0)

    t = out["t"]
    dt_slice = (t[-1] - t[0]) / N
    u = out["u"]
    rng = np.random.default_rng(7)

    model = NNGParareal(n=3, N=N, nn=nn, optimizer="grid")
    model.fit(ds, out["k"])

    for i in range(I, min(I + 4, N)):
        q = jnp.asarray(u[i])
        uGn = solver.coarse_step_raw(t[i], dt_slice, q)
        truth = solver.fine_step_raw(t[i], dt_slice, q) - uGn
        pg = model.predict_fn((), ds, q, q, q, None, jnp.asarray(i))
        m = min(model.m_for(out["k"]), cap)
        idx, d2s = nearest_neighbors(q, ds.X, ds.valid, m)
        xm = np.asarray(jnp.take(ds.X, idx, axis=0))
        ym = np.asarray(jnp.take(ds.D, idx, axis=0))
        ps = scipy_nngp_predict(xm, ym, np.asarray(q), rng)
        tn = np.asarray(truth)
        print(f"i={i}: |truth|={np.abs(tn).max():.2e} "
              f"grid-err={np.abs(np.asarray(pg)-tn).max():.2e} "
              f"scipy-err={np.abs(ps-tn).max():.2e} "
              f"d2 range=[{float(d2s[0]):.1e},{float(d2s[-1]):.1e}]",
              flush=True)


if __name__ == "__main__":
    main()
