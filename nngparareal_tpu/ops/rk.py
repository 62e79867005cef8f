"""Fixed-step explicit Runge-Kutta kernels, TPU-first.

Design (vs reference RK.py:146-203):

* the stage loop is unrolled in Python at trace time (tableaus have at most
  11 stages) so XLA sees one straight-line fused block per step, instead of
  the reference's triple nested ``lax.fori_loop`` over tableau arrays;
* the step loop is a ``lax.fori_loop`` (last-value) or ``lax.scan``
  (trajectory) with the step time computed as ``t0 + n*dt`` (no
  accumulation drift);
* batching over time slices is plain ``jax.vmap`` of these kernels — the
  whole parareal fine fan-out becomes one XLA program over a (N, dim)
  state array, shardable over a device mesh along the slice axis;
* huge step counts are paged on the host in chunks of ``thresh`` steps to
  bound compile size/latency (reference solver.py:86-99 pages similarly,
  though its chunk-size arithmetic re-runs full ``steps`` per page; here
  paging is exact).

All kernels are dtype-polymorphic; the package default is float64.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from nngparareal_tpu.ops.butcher import get_tableau


def rk_step(f, tableau, t, u, h):
    """One explicit RK step for du/dt = f(t, u); stages unrolled."""
    tab = get_tableau(tableau)
    a, b, c = tab.a, tab.b, tab.c
    ks = []
    for i in range(tab.stages):
        ui = u
        for j in range(i):
            aij = a[i][j]
            if aij != 0.0:
                ui = ui + (h * aij) * ks[j]
        ks.append(f(t + c[i] * h, ui))
    acc = None
    for bi, ki in zip(b, ks):
        if bi == 0.0:
            continue
        term = bi * ki
        acc = term if acc is None else acc + term
    return u + h * acc


def integrate_last(f, tableau, t0, dt, steps, u0, unroll=1):
    """Integrate ``steps`` fixed RK steps from (t0, u0); return final state.

    ``steps`` must be a static Python int. Equivalent of reference
    RK.py:146-174 (_RK_jax_last). ``unroll`` trades compile size for fewer
    loop-bookkeeping stalls on long fine solves.
    """
    tab = get_tableau(tableau)
    steps = int(steps)

    def body(n, u):
        t = t0 + n * dt
        return rk_step(f, tab, t, u, dt)

    unroll = max(1, min(int(unroll), steps)) if steps else 1
    return lax.fori_loop(0, steps, body, u0, unroll=unroll)


def integrate_traj(f, tableau, t0, dt, steps, u0):
    """Integrate and return the full trajectory, shape (steps+1, dim).

    Equivalent of reference RK.py:178-203 (_RK_jax_all) on a uniform grid.
    """
    tab = get_tableau(tableau)
    steps = int(steps)

    def body(u, n):
        t = t0 + n * dt
        u_next = rk_step(f, tab, t, u, dt)
        return u_next, u_next

    _, traj = lax.scan(body, u0, jnp.arange(steps))
    return jnp.concatenate([u0[None, :], traj], axis=0)


def integrate_traj_times(f, tableau, t, u0):
    """Trajectory on an arbitrary (possibly non-uniform) time grid ``t``."""
    tab = get_tableau(tableau)

    def body(u, ts):
        t_n, t_np1 = ts
        u_next = rk_step(f, tab, t_n, u, t_np1 - t_n)
        return u_next, u_next

    _, traj = lax.scan(body, u0, (t[:-1], t[1:]))
    return jnp.concatenate([u0[None, :], traj], axis=0)


def make_last_integrator(f, tableau, steps, thresh=int(1e7), jit=True):
    """Build ``step_fn(t0, t1, u0) -> u(t1)`` doing ``steps`` RK steps.

    If ``steps > thresh`` the integration is paged on the host into chunks
    of at most ``thresh`` steps (each chunk one jitted fori_loop), keeping
    compile latency bounded for the reference's Nf ~ 1e6-1e9 fine solves
    (reference solver.py:86-99, new_lib.py:57-74).
    """
    tab = get_tableau(tableau)
    steps = int(steps)
    thresh = int(thresh)

    def chunk_fn(t0, dt, u0, n_chunk):
        return integrate_last(f, tab, t0, dt, n_chunk, u0)

    if jit:
        chunk_fn = jax.jit(chunk_fn, static_argnums=(3,))

    if steps <= thresh:
        def run(t0, t1, u0):
            dt = (t1 - t0) / steps
            return chunk_fn(t0, dt, u0, steps)
        return run

    n_full, rem = divmod(steps, thresh)

    def run_paged(t0, t1, u0):
        dt = (t1 - t0) / steps
        u = u0
        for i in range(n_full):
            u = chunk_fn(t0 + (i * thresh) * dt, dt, u, thresh)
        if rem:
            u = chunk_fn(t0 + (n_full * thresh) * dt, dt, u, rem)
        return u

    return run_paged


def make_traj_integrator(f, tableau, steps, jit=True):
    """Build ``traj_fn(t0, t1, u0) -> (steps+1, dim)`` trajectory kernel."""
    tab = get_tableau(tableau)
    steps = int(steps)

    def run(t0, t1, u0):
        dt = (t1 - t0) / steps
        return integrate_traj(f, tab, t0, dt, steps, u0)

    return jax.jit(run) if jit else run


# below this state dimension the batched fan-out transposes the state to
# (dim, B): a (B, dim) array with dim ~ 3 uses 3 of the VPU's 128 lanes,
# while (dim, B) puts the big slice batch in the lane axis
_TRANSPOSE_DIM_CUTOFF = 64
_LANES = 128  # VPU lane width: the packed layout's trailing-axis size


def _pack_default():
    """Lane packing pays only where (8, 128) register tiling is real —
    i.e. TPU. On CPU the pad-to-128-lanes is genuine extra FLOPs (a B=1
    probe would do 128x the work), so auto mode disables it there."""
    return jax.default_backend() not in ("cpu",)


def make_batched_last_integrator(f, tableau, steps, thresh=int(1e7), jit=True,
                                 unroll=1, pack=None, min_rows=1):
    """Build ``fan_out(t0s, t1s, U) -> (B, dim)``: the parareal fine fan-out.

    One batched RK kernel over all B time slices at once — the TPU-native
    replacement for the reference's MPI pool.map over slices
    (reference parareal.py:310-315). Low-dimensional systems run in a
    packed (dim, B/128, 128) layout (``pack=True``, default): each
    per-coordinate elementwise op then fills whole (8, 128) vector
    registers instead of ceil(B/128) registers at 1/8 sublane fill, ~4x
    fewer per-step instructions on the d=3 zoo. ``pack=False`` keeps the
    flat transposed (dim, B) layout (bitwise-identical results);
    ``pack=None`` (default) enables packing only on non-CPU backends,
    resolved lazily at the first dispatch.

    ``min_rows``: pad the packed layout to at least this many 128-lane
    rows (the sublane axis of the (8, 128) vreg tile). A small-N fan-out
    (B=32 -> rows=1) runs its multi-million-step loop on 1/8-filled
    vregs, which trips the toolchain's degenerate-shape slowdown
    (BENCHMARKS.md engineering notes); ``min_rows=8`` trades up to 8x
    redundant lanes for full-tile ops. Padded rows integrate the
    edge-replicated slice — real slices' results are unchanged.
    """
    tab = get_tableau(tableau)
    steps = int(steps)
    thresh = int(thresh)

    def chunk_fn(t0s, dts, U, n_chunk):
        return jax.vmap(
            lambda t0, dt, u0: integrate_last(f, tab, t0, dt, n_chunk, u0,
                                              unroll=unroll)
        )(t0s, dts, U)

    # transposed path: f vectorized over the trailing batch axis, time as a
    # (B,) vector — one program, no outer vmap, lanes = slices
    fT = jax.vmap(f, in_axes=(0, 1), out_axes=1)

    def chunk_fn_T(t0s, dts, UT, n_chunk):
        return integrate_last(fT, tab, t0s, dts, n_chunk, UT, unroll=unroll)

    # packed path: slices laid out as (rows, 128) in the last two axes;
    # the field vmapped over both batch axes (rows then lanes)
    fP = jax.vmap(fT, in_axes=(0, 1), out_axes=1)

    def chunk_fn_P(t0s, dts, U, n_chunk):
        B, dim = U.shape
        rows = max(-(-B // _LANES), int(min_rows))
        padn = rows * _LANES - B
        t0p = jnp.pad(t0s, (0, padn), mode="edge").reshape(rows, _LANES)
        dtp = jnp.pad(dts, (0, padn), mode="edge").reshape(rows, _LANES)
        Up = jnp.pad(U, ((0, padn), (0, 0)), mode="edge")
        UP = Up.T.reshape(dim, rows, _LANES)
        out = integrate_last(fP, tab, t0p, dtp, n_chunk, UP, unroll=unroll)
        return out.reshape(dim, rows * _LANES).T[:B]

    if jit:
        chunk_fn = jax.jit(chunk_fn, static_argnums=(3,))
        chunk_fn_T = jax.jit(chunk_fn_T, static_argnums=(3,))
        chunk_fn_P = jax.jit(chunk_fn_P, static_argnums=(3,))

    def dispatch(t0s, dts, U, n_chunk):
        if U.shape[1] < _TRANSPOSE_DIM_CUTOFF:
            if pack if pack is not None else _pack_default():
                return chunk_fn_P(t0s, dts, U, n_chunk)
            return chunk_fn_T(t0s, dts, U.T, n_chunk).T
        return chunk_fn(t0s, dts, U, n_chunk)

    if steps <= thresh:
        def run(t0s, t1s, U):
            dts = (t1s - t0s) / steps
            return dispatch(t0s, dts, U, steps)
        return run

    n_full, rem = divmod(steps, thresh)

    def run_paged(t0s, t1s, U):
        dts = (t1s - t0s) / steps
        u = U
        for i in range(n_full):
            u = dispatch(t0s + (i * thresh) * dts, dts, u, thresh)
        if rem:
            u = dispatch(t0s + (n_full * thresh) * dts, dts, u, rem)
        return u

    # the paged host loop must NOT be wrapped in an outer jit: tracing it
    # fuses every page into one executable, voiding the bounded-dispatch
    # contract paging exists for (and producing exactly the huge single
    # executable that kernel-faults the axon TPU worker). The driver
    # checks .paged and calls .warm instead of AOT-compiling — warm
    # executes one page of each distinct chunk size so the page
    # executables are built outside the timed loop.
    def warm(t0s, t1s, U):
        dts = (t1s - t0s) / steps
        u = dispatch(t0s, dts, U, thresh)
        if rem:
            u = dispatch(t0s, dts, u, rem)
        return u

    run_paged.paged = True
    run_paged.warm = warm
    return run_paged


def integrate_last_numpy(f, tableau, t0, t1, steps, u0):
    """Pure-numpy oracle used by the test-suite (independent of JAX)."""
    import numpy as np

    tab = get_tableau(tableau)
    a, b, c = tab.a, tab.b, tab.c
    steps = int(steps)
    dt = (t1 - t0) / steps
    u = np.asarray(u0, dtype=float).copy()
    for n in range(steps):
        t = t0 + n * dt
        ks = []
        for i in range(tab.stages):
            ui = u.copy()
            for j in range(i):
                if a[i][j] != 0.0:
                    ui = ui + dt * a[i][j] * ks[j]
            ks.append(np.asarray(f(t + c[i] * dt, ui)))
        acc = sum(bi * ki for bi, ki in zip(b, ks) if bi != 0.0)
        u = u + dt * acc
    return u
