"""Automatic double-single (f32x2) lifting of f64 vector fields.

``ds_lift(f)`` turns any jnp vector field ``f(t, u) -> du`` written in f64
into its compensated-f32 twin ``f_ds(t, (uh, ul)) -> (kh, kl)`` by tracing
``f`` to a jaxpr and re-interpreting every primitive in double-single
arithmetic (ops/ds32.py). This removes the need for hand-written ds fields
per system (ops/rk_ds.py:make_burgers_ds_field is the hand-fused
prototype): the whole ODE/PDE zoo lifts automatically, including the
[-1,1]-normalization wrapper and stencil fields.

Coverage: the affine/polynomial primitives (add/sub/mul/div/neg/
integer_pow), trigonometry (sin/cos — Thomas labyrinth, double pendulum),
and the structural primitives (slice/concatenate/reshape/broadcast/
transpose/squeeze/select) that stencil and stacked fields lower to.
Unsupported primitives raise at lift time with the primitive name, so a
field that cannot hold the ~1e-14 ds accuracy floor fails loudly instead
of silently degrading the fine solver.

Constants (stencil coefficients, normalization scales) are split exactly
into (hi, lo) pairs on the host; time stays f64 (scalar work per step is
negligible and exact — see ops/rk_ds.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

try:  # jax >= 0.5 moved the jaxpr IR types to jax.extend.core
    from jax.extend.core import Literal as _Literal
except ImportError:  # pragma: no cover
    from jax.core import Literal as _Literal

from nngparareal_tpu.ops import ds32


class _DS:
    """A (hi, lo) f32 pair flowing through the interpreter."""

    __slots__ = ("hi", "lo")

    def __init__(self, hi, lo):
        self.hi = hi
        self.lo = lo


def _split_host(x):
    """Exact ds split of a concrete (host) f64 value."""
    x64 = np.asarray(x, np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return _DS(jnp.asarray(hi), jnp.asarray(lo))


def _to_ds(x):
    if isinstance(x, _DS):
        return x
    if isinstance(x, jax.core.Tracer):
        hi, lo = ds32.ds_from_f64(x)
        return _DS(hi, lo)
    # concrete (numpy or committed jax array): split exactly on the host —
    # this also keeps f64 ops out of Pallas kernel traces
    return _split_host(x)


def _collapse(x):
    """ds -> plain f32 (used only when the field itself downcasts)."""
    return x.hi + x.lo


_STRUCTURAL = {
    "broadcast_in_dim",
    "reshape",
    "transpose",
    "rev",
    "squeeze",
    "slice",
    "expand_dims",
    "copy",
    "stop_gradient",
}


def _eval_jaxpr_ds(jaxpr, consts, *args):
    env = {}

    def read(a):
        if isinstance(a, _Literal):
            return a.val
        return env[a]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    for eqn in jaxpr.eqns:
        prim = eqn.primitive
        name = prim.name
        invals = [read(x) for x in eqn.invars]

        # nested jaxprs (jitted sub-functions, custom_jvp wrappers)
        if name in ("pjit", "jit"):
            inner = eqn.params["jaxpr"]
            outs = _eval_jaxpr_ds(inner.jaxpr, inner.consts, *invals)
            outs = outs if isinstance(outs, (list, tuple)) else [outs]
            for v, o in zip(eqn.outvars, outs):
                write(v, o)
            continue
        if name in ("custom_jvp_call", "custom_vjp_call",
                    "custom_jvp_call_jaxpr"):
            inner = eqn.params.get("call_jaxpr")
            if inner is None:
                inner = eqn.params["fun_jaxpr"]
            outs = _eval_jaxpr_ds(inner.jaxpr, inner.consts, *invals)
            outs = outs if isinstance(outs, (list, tuple)) else [outs]
            for v, o in zip(eqn.outvars, outs):
                write(v, o)
            continue

        has_ds = any(isinstance(x, _DS) for x in invals)
        if not has_ds:
            # plain ops only ever see constants and t in practice; when all
            # inputs are concrete, fold at compile time so no f64 op leaks
            # into the consuming computation (Pallas kernels have no f64)
            concrete = not any(isinstance(x, jax.core.Tracer) for x in invals)
            if concrete:
                with jax.ensure_compile_time_eval():
                    outs = prim.bind(*invals, **eqn.params)
            else:
                outs = prim.bind(*invals, **eqn.params)
            outs = outs if prim.multiple_results else [outs]
            for v, o in zip(eqn.outvars, outs):
                write(v, o)
            continue

        out = _apply_ds(prim, name, invals, eqn.params)
        outs = out if isinstance(out, list) else [out]
        for v, o in zip(eqn.outvars, outs):
            write(v, o)

    return [read(v) for v in jaxpr.outvars]


def _apply_ds(prim, name, invals, params):
    if name in _STRUCTURAL:
        x = invals[0]
        hi = prim.bind(x.hi, **_f32_params(params))
        lo = prim.bind(x.lo, **_f32_params(params))
        return _DS(hi, lo)

    if name == "concatenate":
        vals = [_to_ds(x) for x in invals]
        hi = prim.bind(*[v.hi for v in vals], **params)
        lo = prim.bind(*[v.lo for v in vals], **params)
        return _DS(hi, lo)

    if name in ("add", "add_any", "sub", "mul", "div"):
        a = _to_ds(invals[0])
        b = _to_ds(invals[1])
        a, b = _broadcast_pair(a, b)
        op = {
            "add": ds32.ds_add,
            "add_any": ds32.ds_add,
            "sub": ds32.ds_sub,
            "mul": ds32.ds_mul,
            "div": ds32.ds_div,
        }[name]
        return _DS(*op(a.hi, a.lo, b.hi, b.lo))

    if name == "neg":
        x = invals[0]
        return _DS(-x.hi, -x.lo)

    if name == "integer_pow":
        x = invals[0]
        y = int(params["y"])
        if y < 0:
            base = _pow_ds(x, -y)
            one = _split_host(1.0)
            oneb, baseb = _broadcast_pair(one, base)
            return _DS(*ds32.ds_div(oneb.hi, oneb.lo, baseb.hi, baseb.lo))
        return _pow_ds(x, y)

    if name == "pow":
        exp = invals[1]
        if isinstance(exp, _DS):
            exp = _collapse(exp)
        expf = np.asarray(exp)
        if expf.ndim == 0 and float(expf) == int(float(expf)):
            return _apply_ds(
                None, "integer_pow", [invals[0]],
                {"y": int(float(expf))},
            )
        raise NotImplementedError(
            "ds_lift: non-integer pow exponent cannot hold ds accuracy"
        )

    if name == "sin":
        x = invals[0]
        return _DS(*ds32.ds_sin(x.hi, x.lo))
    if name == "cos":
        x = invals[0]
        return _DS(*ds32.ds_cos(x.hi, x.lo))

    if name == "convert_element_type":
        x = invals[0]
        tgt = params["new_dtype"]
        if np.dtype(tgt) == np.float64:
            return x  # ds pair already carries ~48 bits
        return jnp.asarray(_collapse(x), tgt)

    if name == "select_n":
        pred = invals[0]
        cases = [_to_ds(x) for x in invals[1:]]
        hi = jax.lax.select_n(pred, *[c.hi for c in cases])
        lo = jax.lax.select_n(pred, *[c.lo for c in cases])
        return _DS(hi, lo)

    if name in ("max", "min"):
        a = _to_ds(invals[0])
        b = _to_ds(invals[1])
        a, b = _broadcast_pair(a, b)
        take_a = (a.hi > b.hi) if name == "max" else (a.hi < b.hi)
        eq = a.hi == b.hi
        tie = (a.lo > b.lo) if name == "max" else (a.lo < b.lo)
        take_a = jnp.where(eq, tie, take_a)
        return _DS(
            jnp.where(take_a, a.hi, b.hi), jnp.where(take_a, a.lo, b.lo)
        )

    if name == "abs":
        x = invals[0]
        flip = x.hi < 0
        return _DS(jnp.where(flip, -x.hi, x.hi), jnp.where(flip, -x.lo, x.lo))

    if name in ("gt", "lt", "ge", "le", "eq", "ne"):
        a = _to_ds(invals[0])
        b = _to_ds(invals[1])
        d_hi, d_lo = ds32.ds_sub(a.hi, a.lo, b.hi, b.lo)
        d = d_hi + d_lo
        import operator

        op = {"gt": operator.gt, "lt": operator.lt, "ge": operator.ge,
              "le": operator.le, "eq": operator.eq, "ne": operator.ne}[name]
        return op(d, jnp.zeros_like(d))

    raise NotImplementedError(
        f"ds_lift: primitive '{name}' has no double-single rule; add one in "
        "ops/ds_lift.py or provide a hand-written ds field for this system"
    )


def _f32_params(params):
    """Rewrite dtype-bearing params (broadcast fill dtype etc.) to f32."""
    out = dict(params)
    for k, v in out.items():
        try:
            if v is not None and np.dtype(v) == np.float64:
                out[k] = np.dtype(np.float32)
        except TypeError:
            continue
    return out


def _broadcast_pair(a, b):
    """Broadcast two _DS values to a common shape."""
    shape = jnp.broadcast_shapes(jnp.shape(a.hi), jnp.shape(b.hi))
    return (
        _DS(jnp.broadcast_to(a.hi, shape), jnp.broadcast_to(a.lo, shape)),
        _DS(jnp.broadcast_to(b.hi, shape), jnp.broadcast_to(b.lo, shape)),
    )


def _pow_ds(x, y):
    """x**y for non-negative integer y by binary exponentiation."""
    if y == 0:
        return _split_host(np.ones(np.shape(x.hi)))
    acc = None
    base = x
    while y:
        if y & 1:
            acc = base if acc is None else _DS(
                *ds32.ds_mul(acc.hi, acc.lo, base.hi, base.lo)
            )
        y >>= 1
        if y:
            base = _DS(*ds32.ds_mul(base.hi, base.lo, base.hi, base.lo))
    return acc


def ds_lift(f):
    """Lift ``f(t, u) -> du`` (f64) to ``f_ds(t, (uh, ul)) -> (kh, kl)``.

    The jaxpr is traced per (t-shape, u-shape) combination and cached;
    interpretation happens at trace time, so the lifted field jits/vmaps
    like any other ds field.
    """
    cache = {}

    def f_ds(t, u_pair):
        uh, ul = u_pair
        t_shape = jnp.shape(t)
        key = (t_shape, tuple(uh.shape))
        if key not in cache:
            cache[key] = jax.make_jaxpr(f)(
                jax.ShapeDtypeStruct(t_shape, jnp.float64),
                jax.ShapeDtypeStruct(uh.shape, jnp.float64),
            )
        closed = cache[key]
        outs = _eval_jaxpr_ds(
            closed.jaxpr, closed.consts, jnp.asarray(t), _DS(uh, ul)
        )
        out = outs[0]
        if not isinstance(out, _DS):
            out = _to_ds(out)
        return out.hi, out.lo

    return f_ds
