"""Automatic fine-path selection (solver.select_fine_mode / fine='auto').

The measured winners (BENCHMARKS.md, Pallas A/B table): Burgers d=128 ->
Pallas; Hopf/TomLab d=3 -> XLA ds32; CPU backend -> plain IEEE f64."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nngparareal_tpu.solver import RKSolver, select_fine_mode
from nngparareal_tpu.systems import Burgers, Hopf


def test_select_measured_winners_tpu():
    # the chip backend registers as a non-cpu platform (axon here)
    assert select_fine_mode(128, "axon", True) == "pallas"   # Burgers
    assert select_fine_mode(3, "axon", True) == "ds"         # Hopf/TomLab
    assert select_fine_mode(200, "tpu", True) == "pallas"    # FHN-PDE dx=10


def test_select_cpu_and_no_ds():
    assert select_fine_mode(128, "cpu", True) == "f64"
    assert select_fine_mode(128, "axon", False) == "f64"


def test_auto_resolves_f64_on_cpu_and_matches():
    ode = Burgers(d_x=32, normalization="-11")
    f = ode.get_vector_field()
    kw = dict(Ng=4, Nf=32, G="RK1", F="RK4")
    s_auto = RKSolver(f, fine_ds=ode.get_ds_vector_field(), **kw)
    s_f64 = RKSolver(f, **kw)
    assert s_auto.fine == "auto"

    B = 4
    t0s = jnp.linspace(0.0, 0.4, B, endpoint=False)
    t1s = t0s + 0.1
    U = jnp.tile(jnp.asarray(ode.get_init_cond()), (B, 1))
    out = s_auto.run_F_batch(t0s, t1s, U)
    assert s_auto._fine_mode_resolved == "f64"
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(s_f64.run_F_batch(t0s, t1s, U)))
    # every fine surface follows the resolved mode
    np.testing.assert_array_equal(
        np.asarray(s_auto.run_F(t0s[0], t1s[0], U[0])),
        np.asarray(s_f64.run_F(t0s[0], t1s[0], U[0])),
    )
    np.testing.assert_array_equal(
        np.asarray(s_auto.fine_step_raw(t0s[0], 0.1, U[0])),
        np.asarray(s_f64.fine_step_raw(t0s[0], 0.1, U[0])),
    )


def test_explicit_ds_not_overridden_on_cpu():
    ode = Hopf(normalization="-11")
    f = ode.get_vector_field()
    s = RKSolver(f, Ng=4, Nf=32, G="RK1", F="RK4",
                 fine_ds=ode.get_ds_vector_field(), fine="ds")
    assert s.fine == "ds"
    B = 4
    t0s = jnp.linspace(0.0, 0.4, B, endpoint=False)
    t1s = t0s + 0.1
    U = jnp.tile(jnp.asarray(ode.get_init_cond()), (B, 1))
    out_ds = np.asarray(s.run_F_batch(t0s, t1s, U))
    s64 = RKSolver(f, Ng=4, Nf=32, G="RK1", F="RK4")
    out_64 = np.asarray(s64.run_F_batch(t0s, t1s, U))
    # ds arithmetic actually ran: near-equal but not the f64 bitstream
    np.testing.assert_allclose(out_ds, out_64, rtol=1e-9)
    assert not np.array_equal(out_ds, out_64)


def test_legacy_fine_pallas_flag_maps():
    ode = Burgers(d_x=32, normalization="-11")
    s = RKSolver(ode.get_vector_field(), Ng=4, Nf=64, G="RK1", F="RK8",
                 fine_ds=ode.get_ds_vector_field(), fine_pallas=True)
    assert s.fine == "pallas"
    with pytest.raises(ValueError, match="fine_ds"):
        RKSolver(ode.get_vector_field(), Ng=4, Nf=64, fine="pallas")


def test_driver_resolves_before_paged_check():
    # paged f64 fan-out keeps the .paged contract visible through auto
    ode = Burgers(d_x=32, normalization="-11")
    f = ode.get_vector_field()
    s = RKSolver(f, Ng=4, Nf=256, G="RK1", F="RK8", thresh=64,
                 fine_ds=ode.get_ds_vector_field())
    s.resolve_fine(32)
    assert s._fine_mode_resolved == "f64"  # cpu backend
    assert getattr(s._fine_batch, "paged", False)


def test_autonomy_gate_degrades_to_ds(monkeypatch):
    """auto must not pick pallas for a field whose jaxpr consumes t —
    it degrades to the XLA ds32 fan-out instead of failing the kernel
    build (code-review r4 finding)."""
    from nngparareal_tpu.ops.rk_pallas import ds_field_is_autonomous

    ode = Burgers(d_x=128, normalization="-11")
    assert ds_field_is_autonomous(ode.get_ds_vector_field(), 128)

    def f_ds_t(t, u):
        uh, ul = u
        return uh * t, ul * t  # consumes t

    assert not ds_field_is_autonomous(f_ds_t, 128)

    import nngparareal_tpu.solver as sol

    monkeypatch.setattr(sol.jax, "default_backend", lambda: "axon")
    s = RKSolver(ode.get_vector_field(), Ng=4, Nf=32, G="RK1", F="RK4",
                 fine_ds=f_ds_t)
    assert s.resolve_fine(128) == "ds"
    s2 = RKSolver(ode.get_vector_field(), Ng=4, Nf=32, G="RK1", F="RK4",
                  fine_ds=ode.get_ds_vector_field())
    assert s2.resolve_fine(128) == "pallas"
