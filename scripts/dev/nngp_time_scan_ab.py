"""A/B: unrolled-rounds NNGPTime (pre-refactor snapshot) vs lax.scan rounds.

Must be bitwise-identical on CPU for the same inputs.
Old module snapshot: /tmp/nngp_time_old.py (copied before the edit).
"""
import os
import sys
sys.path.insert(0, os.getcwd())
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import importlib.util
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from nngparareal_tpu.models.base import Dataset
from nngparareal_tpu.models.nngp_time import NNGPTime as NewT

spec = importlib.util.spec_from_file_location("nngp_time_old",
                                              "/tmp/nngp_time_old.py")
old_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_mod)
OldT = old_mod.NNGPTime

n, N, cap = 3, 8, 32
rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(cap, n)))
D = jnp.asarray(rng.normal(size=(cap, n)) * 1e-2)
V = jnp.asarray((np.arange(cap) < 20).astype(float))
ds = Dataset(X, D, V)

kw = dict(n=n, N=N, nn=6, n_restarts=2, reps=2, nn_iters=3,
          nm_max_iters=25, seed=7)
outs = []
for T in (OldT, NewT):
    m = T(**kw)
    m.fit(ds, 2)
    aux = m.sweep_aux(2, N, cap)
    aux_i = {k: v[3] for k, v in aux.items()}
    q = X[5]
    out = m.predict_fn(None, ds, q, D[6], D[7], aux_i, 3)
    outs.append(np.asarray(out))
    print(T.__module__, out)

same = np.array_equal(outs[0], outs[1])
print("bitwise equal:", same)
sys.exit(0 if same else 1)
