"""Fixed-step RK integration in double-single (f32x2) arithmetic.

The f64 RK kernels (ops/rk.py) pay TPU software-emulation on every op and
cannot move into Pallas (Mosaic has no f64). Here the state is a pair of
f32 arrays (hi, lo) carrying ~48 mantissa bits through compensated ops
(ops/ds32.py): every hardware op is native f32, the accumulated state
keeps an O(1e-14) relative floor, and the whole stepper is Pallas-legal.

The vector field must be supplied in ds form: ``f_ds(t, (uh, ul)) ->
(kh, kl)`` — evaluating f in plain f32 would make the fine map F(u)
non-smooth at the ~1e-7 level, which caps the GP correction quality and
inflates K (the convergence oracle). ``burgers_ds_field`` provides the
flagship system's field (reference systems.py:402-459, normalized form).

Validation: tests/test_rk_ds.py checks agreement with the f64 kernels to
~1e-11 over 1e4 steps, and end-to-end K parity is checked on Burgers at
both published tolerances before this path is used in benchmarks.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from nngparareal_tpu.ops.butcher import get_tableau
from nngparareal_tpu.ops import ds32


def _ds_scalar(x_f64):
    """Split a traced (or concrete python) f64 scalar into f32 (hi, lo)."""
    x_f64 = jnp.asarray(x_f64, dtype=jnp.float64)
    hi = x_f64.astype(jnp.float32)
    lo = (x_f64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def ds_axpy(uh, ul, ch, cl, kh, kl):
    """(u + c * k) with ds scalar c and ds array k."""
    ph, pl_ = ds32.ds_mul_f32(kh, kl, ch)
    pl_ = pl_ + kh * cl  # cross term of the scalar's low part
    ph, pl_ = ds32.fast_two_sum(ph, pl_)
    return ds32.ds_add(uh, ul, ph, pl_)


def rk_step_ds(f_ds, tableau, t, uh, ul, h64):
    """One explicit RK step in ds arithmetic; stages unrolled.

    ``t`` and ``h64`` stay f64 scalars (O(stages) scalar ops per step —
    negligible, and exact); all (dim)-shaped arithmetic is f32."""
    tab = get_tableau(tableau)
    a, b, c = tab.a, tab.b, tab.c
    ks = []
    for i in range(tab.stages):
        vh, vl = uh, ul
        for j in range(i):
            aij = a[i][j]
            if aij != 0.0:
                ch, cl = _ds_scalar(h64 * aij)
                vh, vl = ds_axpy(vh, vl, ch, cl, *ks[j])
        ks.append(f_ds(t + c[i] * h64, (vh, vl)))
    outh, outl = uh, ul
    for bi, ki in zip(b, ks):
        if bi == 0.0:
            continue
        ch, cl = _ds_scalar(h64 * bi)
        outh, outl = ds_axpy(outh, outl, ch, cl, *ki)
    return outh, outl


def integrate_last_ds(f_ds, tableau, t0, dt, steps, u0h, u0l, unroll=1):
    """ds twin of ops/rk.py integrate_last: final state after ``steps``."""
    tab = get_tableau(tableau)
    steps = int(steps)

    def body(n, carry):
        uh, ul = carry
        t = t0 + n * dt
        return rk_step_ds(f_ds, tab, t, uh, ul, dt)

    unroll = max(1, min(int(unroll), steps)) if steps else 1
    return lax.fori_loop(0, steps, body, (u0h, u0l), unroll=unroll)


# below this state dimension the batched ds fan-out transposes the state
# to (dim, B) — same rationale as ops/rk.py:_TRANSPOSE_DIM_CUTOFF: a
# (B, dim) array with dim ~ 3 uses 3 of the VPU's 128 lanes, while
# (dim, B) puts the big slice batch in the lane axis
_TRANSPOSE_DIM_CUTOFF = 64
_LANES = 128  # VPU lane width: the packed layout's trailing-axis size


def make_batched_last_integrator_ds(f_ds, tableau, steps, thresh=int(1e7),
                                    jit=True, unroll=1, pack=None,
                                    min_rows=1):
    """ds twin of make_batched_last_integrator: ``fan_out(t0s, t1s, U)``.

    U is (B, dim) f64; internally split into f32 pairs, integrated, and
    recombined — callers see the same f64 contract as the f64 fan-out.
    Batching is ``jax.vmap`` of the single-slice ds stepper (any field
    lifts — see ops/ds_lift.py); low-dimensional systems run in a packed
    (dim, B/128, 128) layout (``pack=True``, default) so every
    per-coordinate elementwise op fills whole (8, 128) vector registers —
    a 1-D (B,)-row op occupies ceil(B/128) registers at 1/8 sublane fill,
    so packing cuts the per-step instruction count ~4x on the d=3 zoo.
    ``pack=False`` falls back to the flat transposed (dim, B) layout
    (the per-slice arithmetic is unchanged; results agree at the ds
    floor). ``pack=None`` (default) packs only on non-CPU backends —
    on CPU the pad-to-128-lanes is real extra work (ops/rk.py
    _pack_default).
    """
    tab = get_tableau(tableau)
    steps = int(steps)
    thresh = int(thresh)

    def chunk(t0s, dts, Uh, Ul, n_chunk):
        def one(t0, dt, uh, ul):
            return integrate_last_ds(f_ds, tab, t0, dt, n_chunk, uh, ul,
                                     unroll=unroll)

        return jax.vmap(one)(t0s, dts, Uh, Ul)

    # transposed path: the field vectorized over a trailing batch axis,
    # time as a (B,) vector — one program, no outer vmap, lanes = slices.
    # Per-slice dt enters rk_step_ds as an (B,) h64 whose split (hi, lo)
    # pairs broadcast against (dim, B) states on the trailing axis.
    fT = jax.vmap(f_ds, in_axes=(0, (1, 1)), out_axes=(1, 1))

    def chunk_T(t0s, dts, UhT, UlT, n_chunk):
        return integrate_last_ds(fT, tab, t0s, dts, n_chunk, UhT, UlT,
                                 unroll=unroll)

    # packed path: slices laid out as (rows, 128) in the last two axes so
    # each coordinate row is a full-width vreg block; the field vmapped
    # over both batch axes (rows then lanes).
    fP = jax.vmap(fT, in_axes=(0, (1, 1)), out_axes=(1, 1))

    def chunk_packed(t0s, dts, Uh, Ul, n_chunk):
        B, dim = Uh.shape
        # min_rows pads small batches into full (8, 128) sublane tiles —
        # the small-N degenerate-shape mitigation (see ops/rk.py)
        rows = max(-(-B // _LANES), int(min_rows))
        padn = rows * _LANES - B
        t0p = jnp.pad(t0s, (0, padn), mode="edge").reshape(rows, _LANES)
        dtp = jnp.pad(dts, (0, padn), mode="edge").reshape(rows, _LANES)

        def to_p(X):
            Xp = jnp.pad(X, ((0, padn), (0, 0)), mode="edge")
            return Xp.T.reshape(dim, rows, _LANES)

        oh, ol = integrate_last_ds(fP, tab, t0p, dtp, n_chunk,
                                   to_p(Uh), to_p(Ul), unroll=unroll)

        def from_p(X):
            return X.reshape(dim, rows * _LANES).T[:B]

        return from_p(oh), from_p(ol)

    if jit:
        chunk = jax.jit(chunk, static_argnums=(4,))
        chunk_T = jax.jit(chunk_T, static_argnums=(4,))
        chunk_packed = jax.jit(chunk_packed, static_argnums=(4,))

    def dispatch(t0s, dts, Uh, Ul, n_chunk):
        if Uh.shape[1] < _TRANSPOSE_DIM_CUTOFF:
            from nngparareal_tpu.ops.rk import _pack_default

            if pack if pack is not None else _pack_default():
                return chunk_packed(t0s, dts, Uh, Ul, n_chunk)
            oh, ol = chunk_T(t0s, dts, Uh.T, Ul.T, n_chunk)
            return oh.T, ol.T
        return chunk(t0s, dts, Uh, Ul, n_chunk)

    def run(t0s, t1s, U):
        dts = (t1s - t0s) / steps
        Uh, Ul = ds32.ds_from_f64(U)
        done = 0
        while done < steps:
            n = min(thresh, steps - done)
            Uh, Ul = dispatch(t0s + done * dts, dts, Uh, Ul, n)
            done += n
        return ds32.ds_to_f64(Uh, Ul)

    if steps > thresh:
        # paged: keep page-bounded dispatches — see ops/rk.py run_paged.
        # warm builds each distinct chunk-size executable once.
        def warm(t0s, t1s, U):
            dts = (t1s - t0s) / steps
            Uh, Ul = ds32.ds_from_f64(U)
            sizes = {thresh}
            if steps % thresh:
                sizes.add(steps % thresh)
            for n in sorted(sizes):
                Uh, Ul = dispatch(t0s, dts, Uh, Ul, n)
            return ds32.ds_to_f64(Uh, Ul)

        run.paged = True
        run.warm = warm
    return run


# --- ds vector fields for the hot systems -------------------------------


def make_burgers_ds_field(ode):
    """ds twin of Burgers._f_norm11 (systems/pdes.py): periodic 3-point
    stencils via roll — f(v) = c2*(vp - 2v + vm) - (v+1)*c1*(vp - vm)."""
    c2 = float(ode._inv_h2)
    c1 = float(0.5 * ode._inv_2h)

    def f_ds(t, v):
        vh, vl = v
        vph, vpl = jnp.roll(vh, -1, axis=-1), jnp.roll(vl, -1, axis=-1)
        vmh, vml = jnp.roll(vh, 1, axis=-1), jnp.roll(vl, 1, axis=-1)
        # v_xx = (vp - 2v + vm) * c2
        sh, sl = ds32.ds_add(vph, vpl, vmh, vml)
        th_, tl_ = ds32.ds_mul_f32(vh, vl, np.float32(-2.0))
        sh, sl = ds32.ds_add(sh, sl, th_, tl_)
        xx_h, xx_l = _ds_scale(sh, sl, c2)
        # v_x = (vp - vm) * c1
        dh, dl = ds32.ds_sub(vph, vpl, vmh, vml)
        x_h, x_l = _ds_scale(dh, dl, c1)
        # (v + 1) * v_x
        wh, wl = ds32.ds_add_f32(vh, vl, np.float32(1.0))
        ph, pl_ = ds32.ds_mul(wh, wl, x_h, x_l)
        return ds32.ds_sub(xx_h, xx_l, ph, pl_)

    return f_ds


def _ds_scale(xh, xl, c_f64):
    """Multiply a ds array by an exact f64 python-float constant (split
    with numpy at trace time — jnp scalar constructors trace)."""
    import numpy as np

    ch = np.float32(c_f64)
    cl = np.float32(c_f64 - float(ch))
    ph, pl_ = ds32.ds_mul_f32(xh, xl, ch)
    pl_ = pl_ + xh * cl
    return ds32.fast_two_sum(ph, pl_)
