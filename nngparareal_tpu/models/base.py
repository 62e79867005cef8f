"""Correction-model interface, redesigned for fused on-device sweeps.

The reference models expose host-level fit/predict called once per
interval, with GP work fanned out to process pools
(reference models.py:19-72). Here a model provides:

* ``fit(ds, k)``            — once per parareal iteration, host-callable,
                              may run batched device work;
* ``predict_fn(...)``       — a *pure traceable* function the driver fuses
                              into the sequential corrector sweep
                              (one lax.scan over intervals);
* ``sweep_aux(k, N)``       — per-interval auxiliary inputs for the sweep
                              (e.g. random hyperparameter restarts);
* ``static_signature(k)``   — hashables that change the traced program
                              (e.g. the adaptive neighbour count m), used
                              by the driver as part of its jit cache key.

The dataset is a fixed-capacity padded device buffer (see ``Dataset``) so
every sweep retains static shapes while the training set grows.
"""

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp


@dataclass
class Dataset:
    """Padded (state, defect) training set.

    X, D: (CAP, n); valid: (CAP,) float mask (1.0 = real row). Rows are
    appended N at a time per parareal iteration; rows belonging to already
    converged slices are masked out, matching the reference's per-iteration
    vstack of only-active slices (reference parareal.py:336-339).
    """

    X: jnp.ndarray
    D: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self):
        return int(self.X.shape[0])

    @property
    def dim(self):
        return int(self.X.shape[1])

    def count(self):
        return int(np.asarray(jnp.sum(self.valid)))

    @staticmethod
    def empty(capacity, n, dtype=jnp.float64):
        return Dataset(
            X=jnp.zeros((capacity, n), dtype=dtype),
            D=jnp.zeros((capacity, n), dtype=dtype),
            valid=jnp.zeros((capacity,), dtype=dtype),
        )

    def appended(self, newX, newD, new_valid, offset):
        """Functional append of a block of rows at a (dynamic) offset."""
        from jax import lax

        off = jnp.asarray(offset)
        zero = jnp.zeros((), dtype=off.dtype)
        return Dataset(
            X=lax.dynamic_update_slice(self.X, jnp.asarray(newX), (off, zero)),
            D=lax.dynamic_update_slice(self.D, jnp.asarray(newD), (off, zero)),
            valid=lax.dynamic_update_slice(
                self.valid, jnp.asarray(new_valid), (off,)
            ),
        )

    def grown(self, new_capacity):
        cap, n = self.capacity, self.dim
        out = Dataset.empty(new_capacity, n, self.X.dtype)
        return Dataset(
            X=out.X.at[:cap].set(self.X),
            D=out.D.at[:cap].set(self.D),
            valid=out.valid.at[:cap].set(self.valid),
        )


class ModelBase:
    name = "Model"
    needs_dataset = True

    def __init__(self, n, N, **kwargs):
        self.n = int(n)
        self.N = int(N)
        # wall-clock accounting filled in by the driver
        self.train_time = 0.0
        self.pred_time = 0.0
        self.pred_times = np.zeros(self.N)
        # per-iteration count of active (predicted) intervals, recorded by
        # the driver so aggregate sweep time can be attributed per interval
        # even when the fused scan sweep hides per-interval walls
        self.active_counts = np.zeros(self.N)
        self.time_k = 0

    # --- to override ---

    def fit(self, ds: Dataset, k: int):
        """Per-iteration training; may launch batched device work."""
        return None

    def sweep_aux(self, k: int, N: int, cap=None):
        """Per-interval aux inputs with leading dim N, or None."""
        return None

    def state_pytree(self):
        """Device state threaded through the sweep jit (may be ())."""
        return ()

    def predict_fn(self, state, ds: Dataset, q, uF_prev, uG_prev, aux_i, i):
        """Pure traceable correction prediction for one interval.

        q: (n,) current iterate at the interval's left node;
        uF_prev/uG_prev: (n,) fine/coarse values from the previous
        iteration at the right node; i: traced interval index.
        Returns the predicted defect (n,).
        """
        raise NotImplementedError

    def static_signature(self, k: int):
        return ()

    def reset_rng(self):
        """Re-seed any host RNG (used to make warmup draws invisible)."""
        return None

    # --- timing bookkeeping (reference models.py:28-46) ---

    def add_train_time(self, k, seconds):
        self.time_k = k
        self.train_time += seconds
        self.pred_times[k] += seconds

    def add_pred_time(self, k, seconds, n_active=None):
        self.pred_time += seconds
        self.pred_times[k] += seconds
        if n_active is not None and k < self.N:
            self.active_counts[k] = n_active

    def get_times(self):
        return {
            "mdl_train_t": self.train_time,
            "mdl_pred_t": self.pred_time,
            "mdl_tot_t": self.train_time + self.pred_time,
            "by_iter": self.pred_times[: self.time_k + 1],
        }

    # --- checkpoint support ---

    # host RNG attributes snapshotted into checkpoints: the reference's
    # resume pickles the model INCLUDING its np Generators (models.py:
    # 262-270), so a resumed run continues the restart-draw stream exactly
    # where the interrupted run left it — we preserve that.
    _RNG_ATTRS = ("rng", "rng2")

    def get_ckpt_state(self):
        rngs = {}
        for a in self._RNG_ATTRS:
            g = getattr(self, a, None)
            if isinstance(g, np.random.Generator):
                rngs[a] = g.bit_generator.state
        return {
            "train_time": self.train_time,
            "pred_time": self.pred_time,
            "pred_times": self.pred_times,
            "active_counts": self.active_counts,
            "time_k": self.time_k,
            "rng_state": rngs,
        }

    def set_ckpt_state(self, state):
        self.train_time = float(state["train_time"])
        self.pred_time = float(state["pred_time"])
        self.pred_times = np.asarray(state["pred_times"])
        self.active_counts = np.asarray(
            state.get("active_counts", np.zeros_like(self.pred_times))
        )
        self.time_k = int(state["time_k"])
        rngs = state.get("rng_state")
        if rngs is None:
            # checkpoint predates rng snapshotting: restart the stream
            # from the seed (the pre-round-3 resume behavior)
            self.reset_rng()
        else:
            for a, s in rngs.items():
                g = getattr(self, a, None)
                if isinstance(g, np.random.Generator):
                    g.bit_generator.state = s
