"""On-chip bisect for the gpjax TPU worker crash (round 3).

Queue-3 job 2: every `model='gpjax'` run died with UNAVAILABLE (TPU worker
crashed / kernel fault) during the first fit. nnGP's NM runs fine on-chip,
so the suspects are the full-GP objective's distinguishing parts: the
growing-Gram (B x B, B>=64) emulated-f64 Cholesky NLL, evaluated under
vmap(C) inside lax.map(n) inside the fixed-NM fori_loop.

Stages (env GP_PROBE_STAGE):
  obj     one batched objective evaluation (no NM loop)
  nm50    nelder_mead_fixed, 50 iters
  nm400   full 400 iters (the queue's config)
  alphas  the alphas() jit
  fit     GParareal.fit() end-to-end on a synthetic dataset
Env GP_PROBE_DTYPE=f32 sets score_dtype=float32.
Env GP_PROBE_CAP sets the dataset bucket (default 64).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

from nngparareal_tpu.models.gp import GParareal
from nngparareal_tpu.models.base import Dataset

STAGE = os.environ.get("GP_PROBE_STAGE", "obj")
CAP = int(os.environ.get("GP_PROBE_CAP", "64"))
DT = jnp.float32 if os.environ.get("GP_PROBE_DTYPE") == "f32" else None

n, N = 2, 40
print("backend:", jax.default_backend(), "stage:", STAGE, "cap:", CAP,
      "score_dtype:", DT, flush=True)

rng = np.random.default_rng(0)
rows = 40
X = np.zeros((CAP, n)); X[:rows] = rng.normal(size=(rows, n))
D = np.zeros((CAP, n)); D[:rows] = 1e-3 * rng.normal(size=(rows, n))
valid = np.zeros(CAP); valid[:rows] = 1.0

mdl = GParareal(n, N, nm_max_iters=400, fatol=1e-6, xatol=1e-6,
                score_dtype=DT,
                optimizer=os.environ.get("GP_PROBE_OPT", "nm"))
fit_warm, alphas, make_obj, fit_grid, _resid = mdl._get_fns(CAP)

dsX, dsD, dsV = jnp.asarray(X), jnp.asarray(D), jnp.asarray(valid)
nj = 9
x0 = jnp.asarray(np.repeat(mdl.thetas, nj, axis=0))  # (n*nj, 2)

t0 = time.time()
if STAGE == "obj":
    obj = make_obj(dsX, dsD, dsV)
    out = jax.jit(obj)(x0[:, None, :] * jnp.ones((1, 3, 1)))
    jax.block_until_ready(out)
    print("obj ok:", np.asarray(out)[:4, 0], f"{time.time()-t0:.1f}s")
elif STAGE in ("nm50", "nm400"):
    iters = 50 if STAGE == "nm50" else 400
    from nngparareal_tpu.ops.optim import nelder_mead_fixed
    obj = make_obj(dsX, dsD, dsV)
    th, fv = nelder_mead_fixed(obj, x0, iters=iters, fatol=1e-6, xatol=1e-6)
    jax.block_until_ready(fv)
    print("nm ok:", np.asarray(fv)[:6], f"{time.time()-t0:.1f}s")
elif STAGE == "alphas":
    th = jnp.asarray(np.tile([0.5, 0.5], (n, 1)))
    jv = jnp.full((n,), -14.0)
    out = alphas(dsX, dsD, dsV, th, jv)
    jax.block_until_ready(out)
    print("alphas ok:", np.asarray(out)[:, :3], f"{time.time()-t0:.1f}s")
elif STAGE == "fit":
    ds = Dataset(X=dsX, D=dsD, valid=dsV)
    mdl.fit(ds, 0)
    print("fit ok: thetas", mdl.thetas, "jit", mdl.jitter_sel,
          f"{time.time()-t0:.1f}s")
elif STAGE == "fitreal":
    # the real FHN k=0 training rows (dumped from the CPU gpjax run):
    # does the crash depend on the data values?
    Xr = np.load("/tmp/fhn_dsX.npy"); Dr = np.load("/tmp/fhn_dsD.npy")
    r = Xr.shape[0]
    X2 = np.zeros((CAP, n)); X2[:r] = Xr
    D2 = np.zeros((CAP, n)); D2[:r] = Dr
    v2 = np.zeros(CAP); v2[:r] = 1.0
    ds = Dataset(X=jnp.asarray(X2), D=jnp.asarray(D2), valid=jnp.asarray(v2))
    mdl.fit(ds, 0)
    print("fitreal ok: thetas", mdl.thetas, "jit", mdl.jitter_sel,
          f"{time.time()-t0:.1f}s")
elif STAGE == "fitseq":
    # the real-driver pattern pinpointed by NNGP_TPU_PARANOID_SYNC: fit at
    # bucket 64 (k=0) succeeds, the SECOND fit at bucket 128 (k=1) kernel-
    # faults. Reproduce: same model, same big backing arrays, two fits.
    BIG = 1280
    rng2 = np.random.default_rng(1)
    Xb = np.zeros((BIG, n)); Db = np.zeros((BIG, n)); vb = np.zeros(BIG)
    Xb[:80] = rng2.normal(size=(80, n))
    Db[:80] = 1e-3 * rng2.normal(size=(80, n))
    dsb = lambda r: Dataset(
        X=jnp.asarray(Xb), D=jnp.asarray(Db),
        valid=jnp.asarray((np.arange(BIG) < r).astype(float)))
    mdl.N = 40
    mdl.fit(dsb(40), 0)   # rows=40 -> bucket 64
    print("fit k=0 (B=64) ok", flush=True)
    mdl.fit(dsb(80), 1)   # rows=80 -> bucket 128
    print("fitseq ok: thetas", mdl.thetas, f"{time.time()-t0:.1f}s")
elif STAGE == "fit3":
    # real-driver interplay: compile+run the FHN fine fan-out and G chain
    # (the big RK executables) first, then the fit on real data — the
    # exact co-residency the crashing runs have and the clean probes lack
    from nngparareal_tpu import FHNODE, Config, RKSolver
    ode = FHNODE(normalization="-11"); cfg = Config(ode).get()
    s = RKSolver(ode.get_vector_field(), cfg["Ng"], cfg["Nf"],
                 G=cfg["G"], F=cfg["F"])
    NN = cfg["N"]; T0, T1 = cfg["tspan"]
    tgrid = jnp.linspace(T0, T1, NN + 1)
    u0 = jnp.asarray(ode.get_init_cond())
    uG = jax.block_until_ready(s.run_G_chain(tgrid, u0))
    print("G chain ok", flush=True)
    uF = jax.block_until_ready(
        s.run_F_batch(tgrid[:-1], tgrid[1:], uG[:-1]))
    print("F fan-out ok", flush=True)
    Xr = np.load("/tmp/fhn_dsX.npy"); Dr = np.load("/tmp/fhn_dsD.npy")
    r = Xr.shape[0]
    X2 = np.zeros((CAP, n)); X2[:r] = Xr
    D2 = np.zeros((CAP, n)); D2[:r] = Dr
    v2 = np.zeros(CAP); v2[:r] = 1.0
    ds = Dataset(X=jnp.asarray(X2), D=jnp.asarray(D2), valid=jnp.asarray(v2))
    mdl.fit(ds, 0)
    print("fit3 ok: thetas", mdl.thetas, "jit", mdl.jitter_sel,
          f"{time.time()-t0:.1f}s")
elif STAGE == "fit2":
    # warmup-like sequence: fit on the empty dataset, restore, fit again
    # on real data — the exact executable re-execution pattern of the run
    ds0 = Dataset(X=jnp.zeros((CAP, n)), D=jnp.zeros((CAP, n)),
                  valid=jnp.zeros(CAP))
    saved = mdl.get_ckpt_state()
    mdl.fit(ds0, 0)
    print("empty fit done", mdl.thetas.ravel()[:4], flush=True)
    mdl.set_ckpt_state(saved)
    Xr = np.load("/tmp/fhn_dsX.npy"); Dr = np.load("/tmp/fhn_dsD.npy")
    r = Xr.shape[0]
    X2 = np.zeros((CAP, n)); X2[:r] = Xr
    D2 = np.zeros((CAP, n)); D2[:r] = Dr
    v2 = np.zeros(CAP); v2[:r] = 1.0
    ds = Dataset(X=jnp.asarray(X2), D=jnp.asarray(D2), valid=jnp.asarray(v2))
    mdl.fit(ds, 0)
    print("fit2 ok: thetas", mdl.thetas, "jit", mdl.jitter_sel,
          f"{time.time()-t0:.1f}s")
print("DONE", flush=True)
