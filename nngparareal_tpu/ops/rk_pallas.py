"""Whole-chunk RK fine fan-out as ONE Pallas TPU kernel (ds32 arithmetic).

Why: the XLA fan-out (ops/rk.py, ops/rk_ds.py) issues each RK stage as
fused-but-separate HLO ops inside a fori_loop; for small-state systems
(Hopf d=3, TomLab d=3) the measured cost is ~12-40us *per step* —
op-issue-bound, not compute-bound (the (3, 512) state is microscopic).
This kernel keeps both f32 halves of the double-single state resident in
VMEM and runs the ENTIRE multi-million-step integration inside one
``pallas_call``: no per-step dispatch, no HBM traffic between steps.

Design:
  * arithmetic is double-single f32 (ops/ds32.py) — Mosaic has no f64,
    and the ds floor (~1e-14 relative) holds the solver's 5e-7/5e-9
    tolerances (validated across the zoo, tests/test_ds_lift.py);
  * layout matches the XLA fan-out's lane rule: lane-packed
    (dim, ceil(B/128), 128) for dim < 64 so every per-coordinate op fills
    whole (8, 128) vregs (slice batch padded to a lane multiple), (B, dim)
    otherwise (ops/rk.py, ops/rk_ds.py packed paths);
  * the parareal fan-out always has a UNIFORM slice width, so the
    per-stage step coefficients h*a_ij / h*b_i are (hi, lo) f32 pairs
    computed from the f64 dt outside the kernel and read from SMEM;
  * all paper systems are autonomous as implemented (Hopf carries time
    as a state coordinate), so the stage times c_i are not materialised;
    fields receive t=0.

Reference equivalent: the inner loop of RK.py:146-174 (_RK_jax_last) —
re-designed as a single resident-state TPU kernel rather than a host- or
XLA-level loop.
"""

import functools

from jax.extend import core as jex_core

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nngparareal_tpu.ops.butcher import get_tableau
from nngparareal_tpu.ops import ds32
from nngparareal_tpu.ops.rk_ds import ds_axpy

_TRANSPOSE_DIM_CUTOFF = 64
_LANES = 128  # VPU lane width: trailing-axis size of the packed layout


def _coef_layout(tab):
    """Flatten the nonzero h*a_ij / h*b_i multipliers into one vector.

    Returns (vals, stage_terms, b_terms): ``vals`` are the tableau
    multipliers (unscaled by h), ``stage_terms[i]`` is a list of
    (j, coef_index) pairs for stage i, ``b_terms`` a list of
    (stage, coef_index).
    """
    vals = []
    stage_terms = []
    for i in range(tab.stages):
        terms = []
        for j in range(i):
            aij = tab.a[i][j] if j < len(tab.a[i]) else 0.0
            if aij != 0.0:
                terms.append((j, len(vals)))
                vals.append(aij)
        stage_terms.append(terms)
    b_terms = []
    for i, bi in enumerate(tab.b):
        if bi != 0.0:
            b_terms.append((i, len(vals)))
            vals.append(bi)
    return np.asarray(vals, np.float64), stage_terms, b_terms


def _make_kernel(f_ds, tab, steps, shape, layout):
    vals, stage_terms, b_terms = _coef_layout(tab)

    if layout == "P":
        # packed (dim, rows, 128): batch in BOTH trailing axes so every
        # per-coordinate elementwise op fills whole (8, 128) vregs — the
        # same lane rule as the XLA fan-out's packed path (ops/rk_ds.py)
        fT = jax.vmap(f_ds, in_axes=(None, (1, 1)), out_axes=(1, 1))
        f_batched = jax.vmap(fT, in_axes=(None, (1, 1)), out_axes=(1, 1))
    elif layout == "T":
        # field over (dim, B): batch in the trailing (lane) axis
        f_batched = jax.vmap(f_ds, in_axes=(None, (1, 1)), out_axes=(1, 1))
    else:
        f_batched = jax.vmap(f_ds, in_axes=(None, (0, 0)), out_axes=(0, 0))

    # Pallas kernels may not capture array constants (the lifted fields
    # close over split normalization/stencil coefficient pairs): trace the
    # batched field once, hoist its consts to explicit kernel inputs, and
    # re-emit its jaxpr inside the kernel with the consts rebound.
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)

    # Build-time autonomy check (advisor round-3 rk_pallas.py:197): the
    # kernel feeds t=0 to the field at every stage, which is only correct
    # when the traced field never consumes t. Trace once with t as a real
    # invar and refuse to build if any equation reads it.
    tspec = jax.ShapeDtypeStruct((), jnp.float32)
    probe = jax.make_jaxpr(lambda t, uh, ul: f_batched(t, (uh, ul)))(
        tspec, spec, spec
    )
    tvar = probe.jaxpr.invars[0]
    t_used = any(
        any(v is tvar for v in eqn.invars
            if not isinstance(v, jex_core.Literal))
        for eqn in probe.jaxpr.eqns
    ) or any(v is tvar for v in probe.jaxpr.outvars
             if not isinstance(v, jex_core.Literal))
    if t_used:
        raise NotImplementedError(
            "pallas fine path requires an autonomous vector field (the "
            "kernel never materialises stage times); this field's jaxpr "
            "consumes t — use the XLA ds32 fan-out instead "
            "(RKSolver(fine_pallas=False))"
        )

    closed = jax.make_jaxpr(lambda uh, ul: f_batched(0.0, (uh, ul)))(spec, spec)
    consts = [np.asarray(c) for c in closed.consts]
    for c in consts:
        if c.dtype == np.float64:
            raise NotImplementedError(
                "lifted field leaks an f64 constant into the kernel — add a "
                "compile-time-eval rule in ops/ds_lift.py for its producer"
            )
    const_shapes = [c.shape for c in consts]
    # VMEM wants >=2D blocks; flat-pad each const to (1, n)
    consts2d = [c.reshape(1, max(1, c.size)) for c in consts]

    def kernel(ch_ref, cl_ref, *refs):
        const_refs = refs[: len(consts)]
        uh_ref, ul_ref, oh_ref, ol_ref = refs[len(consts):]
        cvals = [
            r[:].reshape(s) if s != () else r[0, 0]
            for r, s in zip(const_refs, const_shapes)
        ]
        # the step coefficients are loop-invariant: read each SMEM scalar
        # ONCE before the multi-million-trip loop instead of ~n_coef
        # scalar loads per step
        n_coef = int(vals.shape[0])
        coefs = [(ch_ref[i, 0], cl_ref[i, 0]) for i in range(n_coef)]

        def field(uh, ul):
            kh, kl = jax.core.eval_jaxpr(closed.jaxpr, cvals, uh, ul)
            return kh, kl

        def one_step(_, carry):
            uh, ul = carry
            ks = []
            for i in range(tab.stages):
                vh, vl = uh, ul
                for j, cidx in stage_terms[i]:
                    vh, vl = ds_axpy(vh, vl, *coefs[cidx], *ks[j])
                ks.append(field(vh, vl))
            oh, ol = uh, ul
            for i, cidx in b_terms:
                oh, ol = ds_axpy(oh, ol, *coefs[cidx], *ks[i])
            return oh, ol

        uh, ul = lax.fori_loop(
            0, steps, one_step, (uh_ref[:], ul_ref[:])
        )
        oh_ref[:] = uh
        ol_ref[:] = ul

    return kernel, jnp.asarray(vals), consts2d


def ds_field_is_autonomous(f_ds, dim):
    """True when the ds field's jaxpr never consumes t — the condition
    the whole-chunk kernel requires (it feeds t=0 at every stage).
    Used by ``solver.select_fine_mode``'s auto path to degrade to the
    XLA ds32 fan-out instead of failing the kernel build."""
    spec = jax.ShapeDtypeStruct((dim,), jnp.float32)
    tspec = jax.ShapeDtypeStruct((), jnp.float32)
    try:
        probe = jax.make_jaxpr(lambda t, uh, ul: f_ds(t, (uh, ul)))(
            tspec, spec, spec
        )
    except Exception:
        return False  # untraceable at this shape -> not pallas-eligible
    tvar = probe.jaxpr.invars[0]
    used = any(
        any(v is tvar for v in eqn.invars
            if not isinstance(v, jex_core.Literal))
        for eqn in probe.jaxpr.eqns
    ) or any(v is tvar for v in probe.jaxpr.outvars
             if not isinstance(v, jex_core.Literal))
    return not used


def make_pallas_fanout_ds(f_ds, tableau, steps, interpret=False):
    """Build ``fan_out(t0s, t1s, U) -> (B, dim)`` running in one kernel.

    Same f64-in/f64-out contract as the XLA fan-outs. The slice widths
    t1s - t0s must be uniform (they are, for the parareal grid); the
    fields must be autonomous (every shipped system is).
    """
    tab = get_tableau(tableau)
    steps = int(steps)

    @functools.cache
    def build(dim, B):
        if dim < _TRANSPOSE_DIM_CUTOFF:
            # lane-packed: (dim, rows, 128) with the slice batch padded to
            # a multiple of 128 in the trailing axes
            layout = "P"
            rows = -(-B // _LANES)
            shape = (dim, rows, _LANES)
        else:
            layout = "row"
            shape = (B, dim)
        kernel, vals, consts2d = _make_kernel(f_ds, tab, steps, shape,
                                              layout)
        n_coef = int(vals.shape[0])

        call = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec((n_coef, 1), memory_space=pltpu.SMEM),
                pl.BlockSpec((n_coef, 1), memory_space=pltpu.SMEM),
            ]
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in consts2d]
            + [
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )
        return call, vals, consts2d, layout

    @jax.jit
    def _run(t0s, t1s, U):
        B, dim = U.shape
        call, vals, consts2d, layout = build(int(dim), int(B))
        dt = (t1s[0] - t0s[0]) / steps  # uniform slice width (f64)
        coefs = vals * dt  # (n_coef,) f64
        ch = coefs.astype(jnp.float32)
        cl = (coefs - ch.astype(jnp.float64)).astype(jnp.float32)
        Uh, Ul = ds32.ds_from_f64(U)
        if layout == "P":
            rows = -(-B // _LANES)
            padn = rows * _LANES - B

            def to_p(X):
                Xp = jnp.pad(X, ((0, padn), (0, 0)), mode="edge")
                return Xp.T.reshape(dim, rows, _LANES)

            oh, ol = call(ch[:, None], cl[:, None], *consts2d,
                          to_p(Uh), to_p(Ul))
            oh = oh.reshape(dim, rows * _LANES).T[:B]
            ol = ol.reshape(dim, rows * _LANES).T[:B]
        else:
            oh, ol = call(ch[:, None], cl[:, None], *consts2d, Uh, Ul)
        return ds32.ds_to_f64(oh, ol)

    def run(t0s, t1s, U):
        # Host-side uniform-width guard (advisor round-3 rk_pallas.py:197):
        # the kernel derives ONE dt from slice 0, so non-uniform widths
        # would silently integrate every other slice over the wrong span.
        # Scope: this fires for EAGER callers (scripts/tests calling
        # run_F_batch with concrete arrays). The driver wraps the fan-out
        # in jit/AOT, where t0s is a tracer and the check is skipped —
        # safe there because the driver's grid is jnp.linspace-uniform by
        # construction (driver.py _parareal).
        if not isinstance(t0s, jax.core.Tracer):
            w = np.asarray(jax.device_get(t1s)) - np.asarray(
                jax.device_get(t0s))
            if w.size > 1 and not np.allclose(w, w.flat[0], rtol=1e-12,
                                              atol=0.0):
                raise ValueError(
                    "pallas fine fan-out requires uniform slice widths; "
                    f"got spread [{w.min()!r}, {w.max()!r}] — use the XLA "
                    "ds32 fan-out (RKSolver(fine_pallas=False))"
                )
        return _run(t0s, t1s, U)

    return run
