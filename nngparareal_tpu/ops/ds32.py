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

import numpy as np
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


def ds_div(xh, xl, yh, yl):
    """(x / y) by iterated-correction long division (Bailey's ddouble):
    two Newton-style remainder corrections keep the relative error at the
    ~2^-47 ds floor."""
    q1 = xh / yh
    p1h, p1l = ds_mul_f32(yh, yl, q1)
    rh, rl = ds_sub(xh, xl, p1h, p1l)
    q2 = rh / yh
    p2h, p2l = ds_mul_f32(yh, yl, q2)
    rh, rl = ds_sub(rh, rl, p2h, p2l)
    q3 = rh / yh
    qh, ql = fast_two_sum(q1, q2)
    return ds_add_f32(qh, ql, q3)


# --- trigonometry ---------------------------------------------------------
#
# Needed by the Thomas-labyrinth and double-pendulum vector fields. The
# hardware f32 sin/cos are only ~1e-7 accurate, far off the ~1e-14 ds
# floor, so both are computed from scratch: Cody-Waite range reduction with
# three f32 constants whose products with the (small-integer) quadrant
# count are exact, then ds-Horner Taylor polynomials on |r| <= pi/4.

_TWO_OVER_PI = 0.63661977236758134308
# pi/2 = C1 + C2 + C3 with C1, C2 carrying <=12 significant bits each so
# n * C1 and n * C2 are exact in f32 for quadrant counts |n| < 2^12
_PIO2_C1 = 1.57080078125e00         # 12-bit round of pi/2
_PIO2_C2 = -4.45358455181121826e-06  # 12-bit round of the residual
_PIO2_C3 = -8.70551630782756547e-10  # remaining residual (f32-rounded)

# Taylor coefficients 1/(2k+1)! and 1/(2k)! as ds pairs (hi, lo)
def _ds_const(v):
    hi = np.float32(v)
    lo = np.float32(v - float(hi))
    return hi, lo


_SIN_COEFS = [  # sin(r) = r * (1 + r^2*(c1 + r^2*(c2 + ...)))
    -1.0 / 6.0, 1.0 / 120.0, -1.0 / 5040.0, 1.0 / 362880.0,
    -1.0 / 39916800.0, 1.0 / 6227020800.0, -1.0 / 1307674368000.0,
]
_COS_COEFS = [  # cos(r) = 1 + r^2*(c1 + r^2*(c2 + ...))
    -0.5, 1.0 / 24.0, -1.0 / 720.0, 1.0 / 40320.0, -1.0 / 3628800.0,
    1.0 / 479001600.0, -1.0 / 87178291200.0, 1.0 / 20922789888000.0,
]


def _ds_poly(r2h, r2l, coefs):
    """Horner evaluation sum_k coefs[k] * (r^2)^k in ds, highest first."""
    ch, cl = _ds_const(coefs[-1])
    ph = jnp.full_like(r2h, ch)
    pl = jnp.full_like(r2h, cl)
    for c in reversed(coefs[:-1]):
        ph, pl = ds_mul(ph, pl, r2h, r2l)
        ch, cl = _ds_const(c)
        sh, se = two_sum(ph, ch)
        ph, pl = fast_two_sum(sh, se + (pl + cl))
    return ph, pl


def _sin_cos_reduced(xh, xl):
    """(sin, cos, quadrant) after Cody-Waite reduction to |r| <= pi/4."""
    n = jnp.round(xh * np.float32(_TWO_OVER_PI))
    rh, rl = ds_add_f32(xh, xl, -n * np.float32(_PIO2_C1))
    rh, rl = ds_add_f32(rh, rl, -n * np.float32(_PIO2_C2))
    # n*C3 is not exact; feed its ds product in full
    p3h, p3l = two_prod(n, np.float32(_PIO2_C3))
    rh, rl = ds_sub(rh, rl, p3h, p3l)
    r2h, r2l = ds_mul(rh, rl, rh, rl)
    # sin(r) = r + r^3 * S(r^2)
    sh_, sl_ = _ds_poly(r2h, r2l, _SIN_COEFS)
    sh_, sl_ = ds_mul(sh_, sl_, r2h, r2l)
    sh_, sl_ = ds_mul(sh_, sl_, rh, rl)
    sin_h, sin_l = ds_add(rh, rl, sh_, sl_)
    # cos(r) = 1 + r^2 * C(r^2)
    ch_, cl_ = _ds_poly(r2h, r2l, _COS_COEFS)
    ch_, cl_ = ds_mul(ch_, cl_, r2h, r2l)
    cos_h, cos_l = ds_add_f32(ch_, cl_, np.float32(1.0))
    q = jnp.asarray(n, jnp.int32) & 3
    return (sin_h, sin_l), (cos_h, cos_l), q


def _quadrant_select(q, a, b):
    """Pick (sin-like, cos-like) values per quadrant for sin(x)."""
    (s_h, s_l), (c_h, c_l) = a, b
    # q==0: sin;  q==1: cos;  q==2: -sin;  q==3: -cos
    h = jnp.where(q == 0, s_h, jnp.where(q == 1, c_h,
                  jnp.where(q == 2, -s_h, -c_h)))
    l = jnp.where(q == 0, s_l, jnp.where(q == 1, c_l,
                  jnp.where(q == 2, -s_l, -c_l)))
    return h, l


def ds_sin(xh, xl):
    s, c, q = _sin_cos_reduced(xh, xl)
    return _quadrant_select(q, s, c)


def ds_cos(xh, xl):
    s, c, q = _sin_cos_reduced(xh, xl)
    # cos(x) = sin(x + pi/2): shift the quadrant
    return _quadrant_select((q + 1) & 3, s, c)


def backend_preserves_ds():
    """True if this backend's compiler preserves compensated arithmetic.

    The XLA:CPU pipeline in this toolchain rewrites ``t - (t - a) -> a``
    (and reassociates compensated sums) inside jitted programs when
    operands alias or constant-fold — even through optimization_barrier —
    which collapses the Veltkamp split and silently degrades ds values to
    plain f32 (measured: aliased ``ds_mul(a,b,a,b)`` error jumps from
    ~6e-15 to ~3e-8; eager mode and the TPU backend are exact). This
    canary jits exactly that aliased product and checks the error floor,
    so callers (tests, solvers) can gate jitted ds paths per backend.
    """
    import jax
    import numpy as np_

    x = jnp.linspace(0.1, 0.9, 64, dtype=jnp.float64)
    xh, xl = ds_from_f64(x)
    oh, ol = jax.jit(lambda a, b: ds_mul(a, b, a, b))(xh, xl)
    err = np_.max(np_.abs(np_.asarray(ds_to_f64(oh, ol)) - np_.asarray(x) ** 2))
    return bool(err < 1e-12)
