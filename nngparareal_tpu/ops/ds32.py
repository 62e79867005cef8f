"""Double-single (f32x2) compensated arithmetic for the fine RK solver.

TPU f64 is software-emulated by XLA; Mosaic/Pallas has no f64 at all. A
double-single number represents one value as an unevaluated sum hi + lo of
two f32 with |lo| <= ulp(hi)/2, giving ~48 bits of effective mantissa
(~1e-14 relative) — enough headroom for the solver's 5e-7 and 5e-9
convergence tolerances while every hardware op is native f32 (usable
inside Pallas kernels, unlike f64).

Algorithms: Knuth TwoSum (6 flops, branch-free), Dekker split/TwoProd
(no FMA dependency — JAX exposes no guaranteed-fused multiply-add, and
XLA's opportunistic fusion must NOT change the error term here, so the
product error is extracted with the exact Veltkamp split instead),
renormalised add/mul following Hida-Li-Bailey's double-double kernels
restricted to one correction term.

This is a TPU-native replacement for reference RK.py's reliance on
JAX_ENABLE_X64 (reference parareal.py:28-33 treats x64 as essential);
see ops/rk_ds.py for the RK stepper built on these.
"""

import jax.numpy as jnp


_SPLIT = 4097.0  # 2^12 + 1, Veltkamp split constant for f32 (24-bit mantissa)


def two_sum(a, b):
    """Exact a + b = s + e with s = fl(a + b); Knuth, branch-free."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def fast_two_sum(a, b):
    """Exact a + b = s + e assuming |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Veltkamp split: a = hi + lo with hi, lo each 12-bit exact."""
    t = _SPLIT * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Exact a * b = p + e via Dekker's algorithm (no FMA needed)."""
    p = a * b
    a_hi, a_lo = split(a)
    b_hi, b_lo = split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


# --- double-single (hi, lo) kernels ------------------------------------


def ds_from_f64(x):
    """Split an f64 array into a (hi, lo) f32 pair."""
    hi = jnp.asarray(x).astype(jnp.float32)
    lo = (jnp.asarray(x) - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def ds_to_f64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def ds_add(xh, xl, yh, yl):
    """(x + y) renormalised; ~11 flops (sloppy add is not accurate
    enough for 1e5-step accumulations, so both low parts ride TwoSum)."""
    sh, se = two_sum(xh, yh)
    te = se + (xl + yl)
    return fast_two_sum(sh, te)


def ds_add_f32(xh, xl, y):
    """(x + y) with plain-f32 y."""
    sh, se = two_sum(xh, y)
    return fast_two_sum(sh, se + xl)


def ds_mul(xh, xl, yh, yl):
    """(x * y) renormalised; Dekker product + cross terms."""
    ph, pe = two_prod(xh, yh)
    pe = pe + (xh * yl + xl * yh)
    return fast_two_sum(ph, pe)


def ds_mul_f32(xh, xl, y):
    """(x * y) with plain-f32 y."""
    ph, pe = two_prod(xh, y)
    pe = pe + xl * y
    return fast_two_sum(ph, pe)


def ds_neg(xh, xl):
    return -xh, -xl


def ds_sub(xh, xl, yh, yl):
    return ds_add(xh, xl, -yh, -yl)
