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


# Fine-path auto-selection cutoff: at d >= 64 a step is matmul/stencil-
# sized VPU work and the whole-chunk Pallas kernel wins (Burgers-128:
# 10.6 vs 25.3 us/step); below it the 1-2-vreg operands leave the Pallas
# kernel latency-bound and XLA's fused fan-out wins (Hopf d=3: 10.2 vs
# 72.9) — measured in BENCHMARKS.md "Pallas whole-chunk RK fine kernel".
_PALLAS_DIM_CUTOFF = 64


def select_fine_mode(dim, backend, has_ds):
    """Pick the fine fan-out arithmetic for (state dim, jax backend).

    Returns one of 'f64' | 'ds' | 'pallas'. Measured basis (BENCHMARKS.md
    MFU table): on TPU, ds32 XLA beats emulated f64 at every tested shape
    and Pallas beats ds32 only at PDE-sized d; on CPU, native IEEE f64 is
    both faster and the reference's exact arithmetic, so the ds machinery
    is bypassed."""
    if not has_ds or backend in ("cpu",):
        return "f64"
    return "pallas" if int(dim) >= _PALLAS_DIM_CUTOFF else "ds"


class RKSolver(SolverAbstr):
    def __init__(self, f, Ng, Nf, G="RK1", F="RK4", thresh=int(1e7),
                 fine_ds=None, fine_pallas=False, fine=None,
                 fine_min_rows=1, **kwargs):
        """``fine_ds``: optional double-single (f32x2) vector field
        ``f_ds(t, (uh, ul)) -> (kh, kl)`` (see ops/rk_ds.py; every system
        provides one via ``ode.get_ds_vector_field()``). When given, the
        FINE solver runs in compensated f32 arithmetic — every hardware op
        native f32 instead of emulated f64 — with an end-of-slice
        deviation from the f64 kernels measured at ~3e-11 on the
        production Burgers config (tests/test_rk_ds.py). The coarse
        solver and all driver logic stay f64.

        ``fine``: fan-out path selection — 'f64' | 'ds' | 'pallas' |
        'auto'. 'auto' (the default whenever ``fine_ds`` is supplied)
        resolves lazily at the first batched dispatch from the state
        dimension and the active jax backend via ``select_fine_mode``:
        Pallas for PDE-sized states on TPU, XLA ds32 for the small-d zoo
        on TPU, plain f64 on CPU. 'pallas' runs the whole-chunk Pallas
        TPU kernel (ops/rk_pallas.py) — state resident in VMEM for the
        entire integration; requires ``fine_ds``, uniform slice widths
        (the parareal grid) and an autonomous field. The legacy
        ``fine_pallas=True`` flag is equivalent to ``fine='pallas'``.

        NOTE: because 'auto' picks per-backend arithmetic, K at tight
        tolerances may differ between backends (it already does between
        IEEE f64 CPU and emulated-f64 TPU); pass an explicit ``fine=``
        for cross-backend bit-reproducibility studies.

        ``fine_min_rows``: small-N degenerate-shape mitigation — pad the
        packed fan-out layout to at least this many (128-lane) sublane
        rows (ops/rk.py ``min_rows``)."""
        self.f = f
        self.Ng = int(Ng)
        self.Nf = int(Nf)
        self.G = get_tableau(G)
        self.F = get_tableau(F)
        self.thresh = int(thresh)
        self.fine_ds = fine_ds
        self.fine_min_rows = int(fine_min_rows)

        if fine is None:
            fine = "pallas" if fine_pallas else (
                "auto" if fine_ds is not None else "f64")
        if fine not in ("auto", "f64", "ds", "pallas"):
            raise ValueError(f"fine={fine!r}")
        if fine in ("ds", "pallas") and fine_ds is None:
            raise ValueError(f"fine={fine!r} requires fine_ds")
        if fine == "auto" and fine_ds is None:
            fine = "f64"
        self.fine = fine
        self.fine_pallas = fine == "pallas"

        self._coarse_last = make_last_integrator(f, self.G, self.Ng, self.thresh)
        self._fine_builders = {}
        self._fine_mode_resolved = fine if fine != "auto" else None

        if fine == "f64":
            self._fine_last = make_last_integrator(
                f, self.F, self.Nf, self.thresh
            )
            self._fine_batch = self._get_fine_batch("f64")
        else:
            # auto resolves at the first dispatch (the state dimension and
            # active backend are known there); every fine surface —
            # batched, single-slice, in-sweep raw — follows the SAME
            # resolved mode so serial/mesh/batched paths stay
            # arithmetic-identical
            if fine == "auto":
                self._fine_batch = self._auto_fine_batch
            else:
                self._fine_batch = self._get_fine_batch(fine)

            def _fine_last_any(t0, t1, u0):
                u0 = jnp.asarray(u0)
                mode = (self.resolve_fine(int(u0.shape[-1]))
                        if self.fine == "auto" else self.fine)
                if mode == "f64":
                    if "f64_last" not in self._fine_builders:
                        self._fine_builders["f64_last"] = (
                            make_last_integrator(
                                self.f, self.F, self.Nf, self.thresh
                            )
                        )
                    return self._fine_builders["f64_last"](t0, t1, u0)
                out = self._get_fine_batch(mode)(
                    jnp.asarray(t0)[None], jnp.asarray(t1)[None],
                    u0[None, :],
                )
                return out[0]

            self._fine_last = _fine_last_any
        self._fine_traj = make_traj_integrator(f, self.F, self.Nf)
        self._coarse_traj = make_traj_integrator(f, self.G, self.Ng)
        self._chain_cache = {}

    def _get_fine_batch(self, mode):
        """Build (and cache) the batched fine fan-out for ``mode``."""
        if mode not in self._fine_builders:
            if mode == "f64":
                fan = make_batched_last_integrator(
                    self.f, self.F, self.Nf, self.thresh,
                    min_rows=self.fine_min_rows,
                )
            elif mode == "ds":
                from nngparareal_tpu.ops.rk_ds import (
                    make_batched_last_integrator_ds,
                )

                fan = make_batched_last_integrator_ds(
                    self.fine_ds, self.F, self.Nf, self.thresh,
                    min_rows=self.fine_min_rows,
                )
            elif mode == "pallas":
                from nngparareal_tpu.ops.rk_pallas import (
                    make_pallas_fanout_ds,
                )

                fan = make_pallas_fanout_ds(self.fine_ds, self.F, self.Nf)
            else:  # pragma: no cover
                raise ValueError(mode)
            self._fine_builders[mode] = fan
        return self._fine_builders[mode]

    def resolve_fine(self, dim):
        """Resolve 'auto' for state dimension ``dim``; return the mode.

        Idempotent; after resolution ``_fine_batch`` is the concrete
        fan-out (so contracts like ``.paged``/``.warm`` are visible to
        the driver's AOT machinery). Auto only picks 'pallas' when the
        ds field is actually autonomous (the kernel's requirement) —
        non-autonomous PDE-sized fields degrade to the XLA ds32 path
        instead of failing the kernel build."""
        if self._fine_mode_resolved is None:
            mode = select_fine_mode(
                dim, jax.default_backend(), self.fine_ds is not None
            )
            if mode == "pallas":
                from nngparareal_tpu.ops.rk_pallas import (
                    ds_field_is_autonomous,
                )

                if not ds_field_is_autonomous(self.fine_ds, int(dim)):
                    mode = "ds"
            self._fine_mode_resolved = mode
        if self.fine == "auto":
            self._fine_batch = self._get_fine_batch(self._fine_mode_resolved)
        return self._fine_mode_resolved

    def _auto_fine_batch(self, t0s, t1s, U):
        self.resolve_fine(int(U.shape[-1]))
        return self._fine_batch(t0s, t1s, U)

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
        """Traceable one-slice fine solve, in the RESOLVED fine
        arithmetic (ds for the ds/pallas modes — the Pallas kernel is
        bitwise-identical to the XLA ds path, and a whole-chunk kernel
        cannot be inlined into another traceable)."""
        dt = dt_slice / self.Nf
        mode = self._fine_mode_resolved or self.fine
        if mode == "auto":
            mode = self.resolve_fine(int(u0.shape[-1]))
        if mode in ("ds", "pallas") and self.fine_ds is not None:
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
