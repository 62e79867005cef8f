"""5e-9 precision router (sweep_mode='host_cpu'): model math pinned to
IEEE-f64 CPU while the fine fan-out stays on the default backend
(VERDICT r3 item 6 / PARITY.md TPU-backend note)."""

import jax
import numpy as np

from nngparareal_tpu import FHNODE, Config, RKSolver, Parareal


def _build(eps=5e-7):
    ode = FHNODE(normalization="-11")
    cfg = Config(ode).get()
    solver = RKSolver(ode.get_vector_field(), 16, 400, G="RK2", F="RK4")
    return Parareal(ode, solver, cfg["tspan"], 16, epsilon=eps,
                    verbose=None)


def test_host_cpu_matches_host():
    kw = dict(model="nngp", nn=8, optimizer="grid", warmup=False,
              measure_serial_fine=False, early_stop=4)
    out_host = _build().run(sweep_mode="host", **kw)
    out_cpu = _build().run(sweep_mode="host_cpu", **kw)
    assert out_cpu["k"] == out_host["k"]
    np.testing.assert_array_equal(np.asarray(out_cpu["u"]),
                                  np.asarray(out_host["u"]))


def test_auto_routes_at_tight_eps(monkeypatch):
    p = _build(eps=5e-9)
    mdl = p._make_model("nngp", nn=10)
    import nngparareal_tpu.driver as drv

    monkeypatch.setattr(drv.jax, "default_backend", lambda: "axon")
    assert p._resolve_sweep_mode("auto", mdl) == "host_cpu"
    # loose tolerance / bare parareal / explicit mode: no routing
    assert _build(eps=5e-7)._resolve_sweep_mode("auto", mdl) == "scan"
    bare = p._make_model("parareal")
    assert p._resolve_sweep_mode("auto", bare) == "scan"
    assert p._resolve_sweep_mode("scan", mdl) == "scan"
    monkeypatch.setattr(drv.jax, "default_backend", lambda: "cpu")
    assert p._resolve_sweep_mode("auto", mdl) == "scan"


def test_host_cpu_gpjax():
    kw = dict(model="gpjax", optimizer="grid", warmup=False,
              measure_serial_fine=False, early_stop=3)
    out_host = _build().run(sweep_mode="host", **kw)
    out_cpu = _build().run(sweep_mode="host_cpu", **kw)
    assert out_cpu["k"] == out_host["k"]
    np.testing.assert_array_equal(np.asarray(out_cpu["u"]),
                                  np.asarray(out_host["u"]))


def test_tpu_unsafe_predict_routes_to_host_cpu(monkeypatch):
    """NNGPtime's jitted predict kernel-faults the TPU worker (chipqueue
    r4b/r4f); the driver must route every on-chip sweep request for it —
    explicit 'host'/'scan' included — through the CPU-pinned host sweep."""
    p = _build()
    mdl = p._make_model("nngp_time", nn=8, reps=2, nn_iters=2)
    assert getattr(mdl, "tpu_unsafe_predict", False)
    import nngparareal_tpu.driver as drv

    monkeypatch.setattr(drv.jax, "default_backend", lambda: "axon")
    assert p._resolve_sweep_mode("auto", mdl) == "host_cpu"
    assert p._resolve_sweep_mode("host", mdl) == "host_cpu"
    assert p._resolve_sweep_mode("scan", mdl) == "host_cpu"
    # the never-jitted python sweep is safe by construction
    assert p._resolve_sweep_mode("python", mdl) == "python"
    # mesh runs keep their requested mode (routing would fight sharding)
    assert p._resolve_sweep_mode("scan", mdl, mesh=object()) == "scan"
    # other dataset models are unaffected
    nngp = p._make_model("nngp", nn=8)
    assert p._resolve_sweep_mode("scan", nngp) == "scan"
    monkeypatch.setattr(drv.jax, "default_backend", lambda: "cpu")
    assert p._resolve_sweep_mode("host", mdl) == "host"


def test_host_cpu_nngp_time():
    """The host_cpu machinery must carry NNGPtime's state end-to-end
    (it was built for gp/nngp; nngp-time rides it on-chip now)."""
    kw = dict(model="nngp_time", nn=8, reps=2, nn_iters=2,
              nm_max_iters=40, warmup=False,
              measure_serial_fine=False, early_stop=3)
    out_host = _build().run(sweep_mode="host", **kw)
    out_cpu = _build().run(sweep_mode="host_cpu", **kw)
    assert out_cpu["k"] == out_host["k"]
    np.testing.assert_array_equal(np.asarray(out_cpu["u"]),
                                  np.asarray(out_host["u"]))


def test_fast_sync_matches_attrib():
    """sync_mode='fast' (one device sync per iteration) must be a pure
    timing-accounting change: identical trajectories and K."""
    kw = dict(model="nngp", nn=8, optimizer="grid", warmup=False,
              measure_serial_fine=False, early_stop=4)
    out_a = _build().run(sync_mode="attrib", **kw)
    out_f = _build().run(sync_mode="fast", **kw)
    assert out_f["k"] == out_a["k"]
    np.testing.assert_array_equal(np.asarray(out_f["u"]),
                                  np.asarray(out_a["u"]))
    assert out_f["timings"]["sync_mode"] == "fast"
    assert out_f["timings"]["fused_iter_t"] > 0.0
    assert out_a["timings"]["sync_mode"] == "attrib"
