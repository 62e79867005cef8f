"""nnGParareal with time augmentation (research variant, reference
nnGPara_with_time.py:392-616, "NNGPtime").

The dataset is enriched with the (slice-index, iteration-index) of every
row, both normalised to [-1, 1]; the GP kernel becomes a product of an SE
kernel on the state and SE factors on the two indices, with four log10
hyperparameters (nnGPara_with_time.py:418-436). Neighbour selection is an
iterative kernel-similarity refinement: start from a random subset, fit
hyperparameters, re-select the rows most similar to the query under the
fitted kernel, repeat ``nn_iters`` times, over ``reps`` independent
restarts, keeping the best NLL (nnGPara_with_time.py:550-616).

TPU-native: the padded dataset's row index kk*N + ii already encodes the
(iteration, slice) grid, so augmentation is index arithmetic — no
concatenated columns. All (coordinate x rep) refinement chains advance in
lockstep: each round is one batched Nelder-Mead plus one batched
similarity top-k.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nngparareal_tpu.models.base import ModelBase
from nngparareal_tpu.ops import gp as gpops
from nngparareal_tpu.ops.optim import nelder_mead_fixed


def k_se_time(sqd_stack, theta):
    """Product kernel on stacked squared distances (3, ...):
    space, slice-index, iteration-index (nnGPara_with_time.py:418-428).
    theta = (sigma_x, sigma_y, sigma_intrvl, sigma_iters), log10 scale."""
    sx, sy, s_int, s_it = theta[0], theta[1], theta[2], theta[3]
    expo = (
        10.0 ** (-sx) * sqd_stack[0]
        + 10.0 ** (-s_int) * sqd_stack[1]
        + 10.0 ** (-s_it) * sqd_stack[2]
    )
    return 10.0 ** sy * jnp.exp(-0.5 * expo)


class NNGPTime(ModelBase):
    name = "NNGPtime"
    # the jitted predict program (reps x nn_iters lockstep batched-NM +
    # kernel-similarity top-k over the padded dataset) kernel-faults the
    # TPU worker on the first sweep (chipqueue.log r4b/r4f attempts); the
    # driver routes all non-CPU-backend sweeps to 'host_cpu' for it
    tpu_unsafe_predict = True

    def __init__(
        self,
        n,
        N,
        nn="adaptive",
        n_restarts=1,
        seed=45,
        fatol=None,
        xatol=None,
        nn_iters=5,
        reps=10,
        nm_max_iters=150,
        **kwargs,
    ):
        super().__init__(n, N, **kwargs)
        self.nn = nn
        self.n_restarts = int(n_restarts)
        self.seed = int(seed)
        self.rng = np.random.default_rng(self.seed)
        self.fatol = 1e-1 if fatol is None else float(fatol)
        self.xatol = 1e-1 if xatol is None else float(xatol)
        self.nn_iters = int(nn_iters)
        self.reps = int(reps)
        self.nm_max_iters = int(nm_max_iters)
        self.k = 0

        self._jitters9 = np.arange(-20.0, -11.0)
        # per (coord, rep): 9 jitters x (n_restarts random + 1 ones start)
        self.tasks_per_chain = 9 * (self.n_restarts + 1)
        self.chains = self.n * self.reps

    def m_for(self, k):
        if isinstance(self.nn, str) and self.nn == "adaptive":
            return max(10, int(k) + 2)
        return int(self.nn)

    def fit(self, ds, k):
        self.k = int(k)
        return None

    def reset_rng(self):
        self.rng = np.random.default_rng(self.seed)

    def static_signature(self, k):
        # k itself is traced (threaded through sweep_aux as "kval"), so a
        # fixed-nn run compiles exactly ONE sweep executable — which also
        # keeps the program containing the batched Nelder-Mead unique per
        # process (the axon TPU toolchain kernel-faults the second distinct
        # batched-NM executable; scripts/dev/gp_crash_probe.py fitseq).
        # Only the neighbourhood size m stays static (it sets gather/top_k
        # shapes), so adaptive-nn runs still retrace per m.
        return ("m", self.m_for(k))

    def sweep_aux(self, k, N, cap=None):
        if cap is None:
            raise ValueError("NNGPTime needs the dataset capacity")
        n_rand = self.chains * 9 * self.n_restarts
        theta0 = self.rng.integers(-8, 0, size=(N, n_rand, 4)).astype(float)
        rand = self.rng.random((N, self.chains, cap))
        return {
            "theta0": jnp.asarray(theta0),
            "rand": jnp.asarray(rand),
            # per-slice copy of k: aux leaves are indexed [i] by the sweep
            "kval": jnp.full((N,), float(k)),
        }

    # ------------------------------------------------------------------

    def predict_fn(self, state, ds, q, uF_prev, uG_prev, aux_i, i):
        n, N, R = self.n, self.N, self.reps
        k = self.k
        m = min(self.m_for(k), ds.capacity)
        cap = ds.capacity
        chains = self.chains
        tpc = self.tasks_per_chain

        row = jnp.arange(cap)
        kk = row // N
        ii = row % N
        ii_n = 2.0 * ii / (N - 1) - 1.0
        # iteration-index normalisation: traced k (see static_signature)
        kv = aux_i["kval"]
        kk_n = jnp.where(
            kv < 0.5, jnp.ones(cap), 2.0 * kk / jnp.maximum(kv, 1.0) - 1.0
        )
        q_int = 2.0 * i / (N - 1) - 1.0
        q_iter = 1.0  # nrm_iter(k) == max -> 1

        d2_space_all = gpops.sq_dists_to(q, ds.X)
        d2_int_all = (ii_n - q_int) ** 2
        d2_iter_all = (kk_n - q_iter) ** 2
        valid = ds.valid

        jit9 = jnp.asarray(self._jitters9)
        task_jitters = jnp.tile(jnp.repeat(jit9, self.n_restarts + 1), chains)
        coord_of_chain = jnp.repeat(
            jnp.arange(n, dtype=jnp.int32), R
        )  # (chains,)

        def gather_chain(idx):
            """Per-chain data from row indices idx (m,)."""
            xm = jnp.take(ds.X, idx, axis=0)
            ym = jnp.take(ds.D, idx, axis=0)
            mask = jnp.take(valid, idx)
            iim = jnp.take(ii_n, idx)
            kkm = jnp.take(kk_n, idx)
            s_stack = jnp.stack(
                [
                    gpops.pairwise_sq_dists(xm, xm),
                    (iim[:, None] - iim[None, :]) ** 2,
                    (kkm[:, None] - kkm[None, :]) ** 2,
                ]
            )
            q_stack = jnp.stack(
                [
                    gpops.sq_dists_to(q, xm),
                    (iim - q_int) ** 2,
                    (kkm - q_iter) ** 2,
                ]
            )
            return ym, mask, s_stack, q_stack

        # round-0 selection: random rows (invalid rows never win)
        pen0 = jnp.where(valid > 0, aux_i["rand"], jnp.inf)  # (chains, cap)
        _, idx_cur = jax.lax.top_k(-pen0, m)  # (chains, m)

        # NM starts: n_restarts random + one ones-start per (chain, jitter)
        th_rand = aux_i["theta0"].reshape(chains, 9, self.n_restarts, 4)
        th_ones = jnp.ones((chains, 9, 1, 4))
        x0 = jnp.concatenate([th_rand, th_ones], axis=2).reshape(-1, 4)

        def refine_round(carry, _):
            """One refinement round (nnGPara_with_time.py:550-616): fit all
            (chain x task) simplexes on the current neighbourhoods, keep
            per-chain bests, re-select rows by kernel similarity. A
            ``lax.scan`` body rather than a Python loop: the unrolled
            version emitted ``nn_iters`` copies of the batched-NM scan in
            ONE sweep executable, which at the full Lorenz config
            (nn_iters=20, 5670 simplexes) kernel-faulted the axon TPU
            worker (round-3/4 crashes at driver.py _block) and retraced
            minutes of XLA compile per capacity bucket on CPU."""
            best_fv, best_th, best_jit, best_idx, idx_cur = carry
            ym_c, mask_c, s_c, qs_c = jax.vmap(gather_chain)(idx_cur)
            y_c = jax.vmap(lambda ym, c: jnp.take(ym, c, axis=1))(
                ym_c, coord_of_chain
            )  # (chains, m)

            def obj(pts):  # (B, C, 4) -> (B, C), B = chains*tpc
                C = pts.shape[1]
                per_chain = pts.reshape(chains, tpc, C, 4)
                jits_pc = task_jitters.reshape(chains, tpc)

                def chain_fn(th_ct, jv_t, y, s_stack, mask):
                    def one_task(th_c, jv):
                        return jax.vmap(
                            lambda t: gpops.nll_from_sqd(
                                s_stack, y, t, jv, mask, k_se_time
                            )
                        )(th_c)

                    return jax.vmap(one_task)(th_ct, jv_t)

                out = jax.vmap(chain_fn)(per_chain, jits_pc, y_c, s_c, mask_c)
                return out.reshape(pts.shape[0], C)

            # fixed-iteration NM: scan-safe on TPU (see ops/optim.py)
            th, fv = nelder_mead_fixed(
                obj, x0, iters=self.nm_max_iters,
                fatol=self.fatol, xatol=self.xatol,
            )
            fv_c = fv.reshape(chains, tpc)
            th_c = th.reshape(chains, tpc, 4)
            jv_c = task_jitters.reshape(chains, tpc)
            b = jnp.argmin(fv_c, axis=1)
            fv_best = jnp.take_along_axis(fv_c, b[:, None], 1)[:, 0]
            th_best = jnp.take_along_axis(th_c, b[:, None, None], 1)[:, 0]
            jv_best = jnp.take_along_axis(jv_c, b[:, None], 1)[:, 0]

            improve = fv_best < best_fv
            best_fv = jnp.where(improve, fv_best, best_fv)
            best_th = jnp.where(improve[:, None], th_best, best_th)
            best_jit = jnp.where(improve, jv_best, best_jit)
            best_idx = jnp.where(improve[:, None], idx_cur, best_idx)

            # kernel-similarity re-selection under this round's theta
            # (computed on the last round too and discarded — keeps the
            # body round-independent so it scans)
            def similarity(th):
                stack_all = jnp.stack(
                    [d2_space_all, d2_int_all, d2_iter_all]
                )
                s = k_se_time(stack_all, th)
                return jnp.where(valid > 0, s, -jnp.inf)

            sims = jax.vmap(similarity)(th_best)  # (chains, cap)
            _, idx_cur = jax.lax.top_k(sims, m)
            return (best_fv, best_th, best_jit, best_idx, idx_cur), None

        carry0 = (
            jnp.full((chains,), jnp.inf),
            jnp.ones((chains, 4)),
            jnp.full((chains,), -16.0),
            idx_cur,
            idx_cur,
        )
        (best_fv, best_th, best_jit, best_idx, _), _ = jax.lax.scan(
            refine_round, carry0, None, length=self.nn_iters
        )

        # per coordinate: best chain among its reps
        fv_cr = best_fv.reshape(n, R)
        rbest = jnp.argmin(fv_cr, axis=1)
        sel = jnp.arange(n) * R + rbest  # chain index per coord

        def final_pred(chain_id, c):
            idx = best_idx[chain_id]
            ym_c, mask_c, s_c, qs_c = gather_chain(idx)
            y = jnp.take(ym_c, c, axis=1)
            return gpops.predict_mean_from_sqd(
                s_c, qs_c, y, best_th[chain_id], best_jit[chain_id], mask_c,
                k_se_time,
            )

        return jax.vmap(final_pred)(sel, jnp.arange(n, dtype=jnp.int32))
