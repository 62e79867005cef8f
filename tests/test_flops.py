"""FLOP-accounting utility (utils/flops.py) — the MFU numbers in
BENCHMARKS.md are only as good as this counter."""

import jax
import jax.numpy as jnp
import pytest

from nngparareal_tpu.utils.flops import flops_of


def test_axpb():
    spec = jax.ShapeDtypeStruct((128,), jnp.float64)
    c = flops_of(lambda x: 2.0 * x + 1.0, spec)
    assert c["flops"] == 256


def test_dot_general():
    a = jax.ShapeDtypeStruct((64, 128), jnp.float64)
    b = jax.ShapeDtypeStruct((128, 32), jnp.float64)
    c = flops_of(lambda a, b: a @ b, a, b)
    assert c["flops"] == 2 * 64 * 32 * 128


def test_scan_multiplies():
    spec = jax.ShapeDtypeStruct((8,), jnp.float64)

    def f(x):
        def body(u, _):
            return u * 2.0 + 1.0, None

        u, _ = jax.lax.scan(body, x, None, length=10)
        return u

    c = flops_of(f, spec)
    assert c["flops"] == 10 * 16


def test_transcendental_tracked():
    spec = jax.ShapeDtypeStruct((8,), jnp.float64)
    c = flops_of(jnp.exp, spec)
    assert c["transcendental"] == 8


def test_unknown_primitive_raises():
    spec = jax.ShapeDtypeStruct((4, 4), jnp.float64)
    with pytest.raises(NotImplementedError):
        flops_of(jnp.linalg.svd, spec)


def test_rk_step_counts_burgers():
    from nngparareal_tpu.systems import Burgers
    from nngparareal_tpu.ops.rk import rk_step

    ode = Burgers(d_x=32, normalization="-11")
    f = jax.vmap(ode.get_vector_field(), in_axes=(None, 0))
    U = jax.ShapeDtypeStruct((8, 32), jnp.float64)
    c = flops_of(lambda u: rk_step(f, "RK4", 0.0, u, 1e-5), U)
    # 4 stages x (field + axpys): must be a few-thousand positive count
    assert c["flops"] > 1000
    assert c["div"] == 0  # Burgers stencil is mul/add only


def test_counter_matches_xla_cost_analysis_field_level():
    """Cross-check against XLA's own cost model at fusion-free
    granularity: the Burgers field's flop count must agree EXACTLY.
    (Whole-step comparisons diverge because XLA's cost analysis counts
    rematerialized flops inside overlapping fusions — the jaxpr counter
    deliberately reports the algorithmic count; see BENCHMARKS.md.)"""
    import numpy as np
    from nngparareal_tpu.systems import Burgers

    ode = Burgers(d_x=128, normalization="-11")
    f = jax.vmap(ode.get_vector_field(), in_axes=(None, 0))
    spec = jax.ShapeDtypeStruct((128, 128), jnp.float64)
    ours = flops_of(lambda u: f(0.0, u), spec)["flops"]
    U = jnp.asarray(np.random.default_rng(0).normal(size=(128, 128)) * 0.01)
    ca = jax.jit(lambda u: f(0.0, u)).lower(U).compile().cost_analysis()
    assert ca.get("flops") == ours == 147456
