"""Coarse/fine propagator abstraction.

Equivalent surface to the reference SolverAbstr/SolverRK/SolverScipy
(reference solver.py:29-148) redesigned around batching:

* ``run_F`` / ``run_G`` integrate one slice;
* ``run_F_batch`` integrates *all* slices at once (one vmapped XLA
  program, shardable over a mesh) — the replacement for the MPI pool.map
  fan-out (reference parareal.py:310-315);
* ``run_G_chain`` runs the inherently-sequential coarse initialisation
  over all slices as a single ``lax.scan`` (reference parareal.py:264-277
  does this as a Python loop of jitted calls);
* ``coarse_step_raw`` / ``fine_step_raw`` are untraced building blocks the
  parareal sweep kernel fuses into its own scan body.

Step counts Ng/Nf are per-slice (the reference Config divides totals by N,
configs.py:16). Paging via ``thresh`` bounds compile size for huge Nf
(reference solver.py:86-99).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from nngparareal_tpu.ops.butcher import get_tableau
from nngparareal_tpu.ops.rk import (
    integrate_last,
    integrate_traj,
    make_last_integrator,
    make_batched_last_integrator,
    make_traj_integrator,
)
from nngparareal_tpu.utils.timing import wall_timed


class SolverAbstr:
    def run_F(self, t0, t1, u0):
        raise NotImplementedError

    def run_G(self, t0, t1, u0):
        raise NotImplementedError

    def run_F_full(self, t0, t1, u0):
        raise NotImplementedError

    def run_G_full(self, t0, t1, u0):
        raise NotImplementedError

    def run_F_timed(self, t0, t1, u0):
        return wall_timed(self.run_F)(t0, t1, u0)

    def run_G_timed(self, t0, t1, u0):
        return wall_timed(self.run_G)(t0, t1, u0)

    def run_F_full_timed(self, t0, t1, u0):
        return wall_timed(self.run_F_full)(t0, t1, u0)

    def run_G_full_timed(self, t0, t1, u0):
        return wall_timed(self.run_G_full)(t0, t1, u0)


class RKSolver(SolverAbstr):
    def __init__(self, f, Ng, Nf, G="RK1", F="RK4", thresh=int(1e7),
                 fine_ds=None, fine_pallas=False, **kwargs):
        """``fine_ds``: optional double-single (f32x2) vector field
        ``f_ds(t, (uh, ul)) -> (kh, kl)`` (see ops/rk_ds.py; every system
        provides one via ``ode.get_ds_vector_field()``). When given, the
        FINE solver runs in compensated f32 arithmetic — every hardware op
        native f32 instead of emulated f64 — with an end-of-slice
        deviation from the f64 kernels measured at ~3e-11 on the
        production Burgers config (tests/test_rk_ds.py). The coarse
        solver and all driver logic stay f64.

        ``fine_pallas``: run the fine fan-out as ONE whole-chunk Pallas
        TPU kernel (ops/rk_pallas.py) — state resident in VMEM for the
        entire integration, no per-step op-issue cost. Requires
        ``fine_ds`` and uniform slice widths (the parareal grid)."""
        self.f = f
        self.Ng = int(Ng)
        self.Nf = int(Nf)
        self.G = get_tableau(G)
        self.F = get_tableau(F)
        self.thresh = int(thresh)
        self.fine_ds = fine_ds
        self.fine_pallas = bool(fine_pallas)
        if self.fine_pallas and fine_ds is None:
            raise ValueError("fine_pallas=True requires fine_ds")

        self._coarse_last = make_last_integrator(f, self.G, self.Ng, self.thresh)
        if fine_ds is None:
            self._fine_last = make_last_integrator(
                f, self.F, self.Nf, self.thresh
            )
            self._fine_batch = make_batched_last_integrator(
                f, self.F, self.Nf, self.thresh
            )
        else:
            from nngparareal_tpu.ops.rk_ds import (
                make_batched_last_integrator_ds,
            )

            if self.fine_pallas:
                from nngparareal_tpu.ops.rk_pallas import (
                    make_pallas_fanout_ds,
                )

                self._fine_batch = make_pallas_fanout_ds(
                    fine_ds, self.F, self.Nf
                )
            else:
                self._fine_batch = make_batched_last_integrator_ds(
                    fine_ds, self.F, self.Nf, self.thresh
                )

            def _fine_last_ds(t0, t1, u0):
                out = self._fine_batch(
                    jnp.asarray(t0)[None], jnp.asarray(t1)[None],
                    jnp.asarray(u0)[None, :],
                )
                return out[0]

            self._fine_last = _fine_last_ds
        self._fine_traj = make_traj_integrator(f, self.F, self.Nf)
        self._coarse_traj = make_traj_integrator(f, self.G, self.Ng)
        self._chain_cache = {}

    # --- single-slice API (reference solver.py:102-113) ---

    def run_F(self, t0, t1, u0):
        return self._fine_last(t0, t1, jnp.asarray(u0))

    def run_G(self, t0, t1, u0):
        return self._coarse_last(t0, t1, jnp.asarray(u0))

    def run_F_full(self, t0, t1, u0):
        return self._fine_traj(t0, t1, jnp.asarray(u0))

    def run_G_full(self, t0, t1, u0):
        return self._coarse_traj(t0, t1, jnp.asarray(u0))

    # --- batched / fused API (TPU-native additions) ---

    def run_F_batch(self, t0s, t1s, U):
        """Fine-solve all slices at once: (B,), (B,), (B, n) -> (B, n)."""
        return self._fine_batch(jnp.asarray(t0s), jnp.asarray(t1s), jnp.asarray(U))

    def coarse_step_raw(self, t0, dt_slice, u0):
        """Traceable one-slice coarse solve (used inside the sweep scan)."""
        dt = dt_slice / self.Ng
        return integrate_last(self.f, self.G, t0, dt, self.Ng, u0)

    def fine_step_raw(self, t0, dt_slice, u0):
        dt = dt_slice / self.Nf
        if self.fine_ds is not None:
            from nngparareal_tpu.ops import ds32
            from nngparareal_tpu.ops.rk_ds import integrate_last_ds

            uh, ul = ds32.ds_from_f64(u0)
            oh, ol = integrate_last_ds(
                self.fine_ds, self.F, t0, dt, self.Nf, uh, ul
            )
            return ds32.ds_to_f64(oh, ol)
        return integrate_last(self.f, self.F, t0, dt, self.Nf, u0)

    def run_G_chain(self, t, u0):
        """Sequential coarse init over all N slices as one lax.scan.

        t: (N+1,) uniform grid. Returns (N+1, n) with row 0 = u0.
        (reference parareal.py:264-277)
        """
        N = int(t.shape[0]) - 1
        key = ("chain", N)
        if key not in self._chain_cache:
            def chain(t0s, dt_slice, u0):
                def body(u, t0):
                    u_next = self.coarse_step_raw(t0, dt_slice, u)
                    return u_next, u_next

                _, traj = lax.scan(body, u0, t0s)
                return jnp.concatenate([u0[None, :], traj], axis=0)

            self._chain_cache[key] = jax.jit(chain)
        dt_slice = (t[-1] - t[0]) / N
        return self._chain_cache[key](jnp.asarray(t[:-1]), dt_slice, jnp.asarray(u0))


class ScipySolver(SolverAbstr):
    """Adaptive scipy fine solver for host-side validation
    (reference solver.py:116-148). Nf is a soft constraint; the coarse
    solver delegates to RKSolver."""

    _MAP = {"RK2": "RK23", "RK4": "RK45", "RK8": "DOP853"}

    def __init__(self, f, Ng, Nf, G="RK1", F="RK45", **kwargs):
        self.f = f
        self.Ng = int(Ng)
        self.Nf = int(Nf)
        self.F = self._MAP.get(str(F).upper(), F)
        self.kwargs = kwargs
        self.rk = RKSolver(f, Ng, Nf, G=G, F="RK4")

    def run_F(self, t0, t1, u0):
        from scipy.integrate import solve_ivp

        def f_np(t, u):
            return np.asarray(self.f(t, jnp.asarray(u)))

        res = solve_ivp(
            f_np, [t0, t1], np.asarray(u0), method=self.F, t_eval=(t1,),
            max_step=(t1 - t0) / self.Nf, **self.kwargs,
        )
        if res.nfev > self.Nf * 1.5:
            print(
                f"Warning: F solver did {res.nfev / self.Nf:0.1f}x more steps "
                "than expected"
            )
        return res.y.reshape(-1)

    def run_G(self, t0, t1, u0):
        return self.rk.run_G(t0, t1, u0)

    # engine surface: host-looped fine fan-out (scipy is a CPU validation
    # path; the coarse side delegates to the RK kernels)
    def run_F_batch(self, t0s, t1s, U):
        t0s, t1s, U = np.asarray(t0s), np.asarray(t1s), np.asarray(U)
        out = [self.run_F(t0s[i], t1s[i], U[i]) for i in range(U.shape[0])]
        return jnp.asarray(np.stack(out))

    def run_G_chain(self, t, u0):
        return self.rk.run_G_chain(t, u0)

    def coarse_step_raw(self, t0, dt_slice, u0):
        return self.rk.coarse_step_raw(t0, dt_slice, u0)

    def fine_step_raw(self, t0, dt_slice, u0):
        return self.rk.fine_step_raw(t0, dt_slice, u0)
