"""Automatic double-single lifting (ops/ds_lift.py) + trig/div kernels.

The XLA:CPU pipeline on this toolchain miscompiles *some* compensated-
arithmetic patterns inside jitted programs (aliased products, folded
constants) — see ds32.backend_preserves_ds. Eager op-by-op execution is
correct on every backend, so numeric-accuracy assertions here run the
lifted fields and steppers eagerly; the jitted end-to-end path is
validated on the TPU backend (scripts/ds_zoo_validate.py, PARITY.md).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nngparareal_tpu.ops import ds32
from nngparareal_tpu.ops.ds_lift import ds_lift
from nngparareal_tpu.ops.rk_ds import rk_step_ds
from nngparareal_tpu.ops.rk import rk_step
from nngparareal_tpu.systems import (
    FHNODE,
    Rossler,
    Hopf,
    DblPend,
    Brusselator,
    Lorenz,
    ThomasLabyrinth,
    Burgers,
    FHNPDE,
)

ZOO = [
    (FHNODE, {}),
    (Rossler, {}),
    (Hopf, {}),
    (DblPend, {}),
    (Brusselator, {}),
    (Lorenz, {}),
    (ThomasLabyrinth, {}),
    (Burgers, {"d_x": 32}),
    (FHNPDE, {"d_x": 6}),
]


def test_ds_sin_cos_accuracy():
    x = np.random.default_rng(0).uniform(-14.0, 14.0, size=5000)
    xh, xl = ds32.ds_from_f64(jnp.asarray(x))
    sh, sl = ds32.ds_sin(xh, xl)
    assert np.abs(np.asarray(ds32.ds_to_f64(sh, sl)) - np.sin(x)).max() < 5e-14
    ch, cl = ds32.ds_cos(xh, xl)
    assert np.abs(np.asarray(ds32.ds_to_f64(ch, cl)) - np.cos(x)).max() < 5e-14


def test_ds_div_accuracy():
    rng = np.random.default_rng(1)
    a = rng.uniform(-5, 5, size=5000)
    b = rng.uniform(0.5, 4.0, size=5000) * rng.choice([-1.0, 1.0], size=5000)
    ah, al = ds32.ds_from_f64(jnp.asarray(a))
    bh, bl = ds32.ds_from_f64(jnp.asarray(b))
    qh, ql = ds32.ds_div(ah, al, bh, bl)
    rel = np.abs(np.asarray(ds32.ds_to_f64(qh, ql)) - a / b) / np.abs(a / b)
    assert rel.max() < 5e-14


@pytest.mark.parametrize("cls,kw", ZOO, ids=lambda v: getattr(v, "__name__", ""))
def test_lifted_field_matches_f64(cls, kw):
    """Eager lifted-field evaluation agrees with the f64 field to the ds
    floor across the whole zoo (VERDICT r2 item 1)."""
    ode = cls(normalization="-11", **kw)
    f = ode.get_vector_field()
    f_ds = ode.get_ds_vector_field()
    rng = np.random.default_rng(3)
    worst = 0.0
    for _ in range(10):
        u = jnp.asarray(rng.uniform(-0.9, 0.9, size=ode.get_dim()))
        uh, ul = ds32.ds_from_f64(u)
        kh, kl = f_ds(jnp.asarray(0.3), (uh, ul))
        got = np.asarray(ds32.ds_to_f64(kh, kl))
        want = np.asarray(f(0.3, u))
        scale = max(1.0, float(np.abs(want).max()))
        worst = max(worst, float(np.abs(got - want).max()) / scale)
    assert worst < 1e-11, worst


@pytest.mark.parametrize(
    "cls,kw",
    [(Lorenz, {}), (ThomasLabyrinth, {}), (DblPend, {}), (Hopf, {})],
    ids=lambda v: getattr(v, "__name__", ""),
)
def test_lifted_rk_steps_track_f64(cls, kw):
    """30 eager RK4 steps in ds arithmetic stay within ~1e-11 of f64.

    Eager execution is deliberate (see module docstring) but slow —
    30 steps already accumulate well past any single-step fluke while
    keeping the suite wall down; the long-horizon ds tracking evidence
    is the on-chip K-parity table (PARITY.md ds32 section)."""
    ode = cls(normalization="-11", **kw)
    f = ode.get_vector_field()
    f_ds = ode.get_ds_vector_field()
    u = jnp.asarray(ode.get_init_cond())
    uh, ul = ds32.ds_from_f64(u)
    dt = 1e-3
    for n in range(30):
        t = n * dt
        u = rk_step(f, "RK4", t, u, dt)
        uh, ul = rk_step_ds(f_ds, "RK4", t, uh, ul, jnp.asarray(dt))
    got = np.asarray(ds32.ds_to_f64(uh, ul))
    assert np.abs(got - np.asarray(u)).max() < 1e-11


def test_unsupported_primitive_raises():
    from nngparareal_tpu.systems import DiffReact

    ode = DiffReact(d_x=4, normalization="-11")
    f_ds = ode.get_ds_vector_field()
    u = jnp.zeros(ode.get_dim())
    uh, ul = ds32.ds_from_f64(u)
    with pytest.raises(NotImplementedError, match="dot_general"):
        f_ds(jnp.asarray(0.0), (uh, ul))


def test_backend_canary_runs():
    """The canary must execute; on this CPU toolchain it documents the
    known miscompile (False), on TPU it must be True."""
    ok = ds32.backend_preserves_ds()
    assert ok in (True, False)
    if jax.default_backend() not in ("cpu",):
        assert ok, "non-CPU backend must preserve compensated arithmetic"
