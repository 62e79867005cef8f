"""Mesh execution with GP models + checkpointing with nnGP."""

import os

import numpy as np
import jax
import pytest

from nngparareal_tpu import FHNODE, Config, RKSolver, Parareal
from nngparareal_tpu.parallel.mesh import make_mesh


def _build():
    # mini FHN config: equivalence/checkpoint semantics don't need the
    # paper-sized problem (keeps the suite fast)
    ode = FHNODE(normalization="-11")
    solver = RKSolver(ode.get_vector_field(), 4, 400, G="RK2", F="RK4")
    return Parareal(ode, solver, [0, 16], 16, epsilon=5e-7, verbose=None)


def test_nngp_grid_on_mesh_matches_single_device():
    mesh = make_mesh(8)
    out_mesh = _build().run(model="nngp", nn=10, optimizer="grid", mesh=mesh,
                            early_stop=3)
    out_one = _build().run(model="nngp", nn=10, optimizer="grid",
                           early_stop=3)
    assert out_mesh["conv_int"] == out_one["conv_int"]
    np.testing.assert_allclose(out_mesh["u"], out_one["u"], rtol=1e-10)


def test_gpjax_grid_on_mesh_matches_single_device():
    """The GParareal grid hyperopt shards its (coord x jitter) task pool
    over the mesh (reference trains GP tasks over the MPI pool,
    models.py:386-421); per-task NLL scoring is identical arithmetic on
    every device, so the mesh run must reproduce the single-device run."""
    # mesh==single-device equality is independent of the theta-search
    # size; a 7-point grid keeps the semantics while cutting the 1-core
    # CPU fit cost ~3x (suite-wall budget)
    grid_logs = np.linspace(-4.5, 1.5, 7)
    mesh = make_mesh(8)
    out_mesh = _build().run(model="gpjax", optimizer="grid", mesh=mesh,
                            grid_logs=grid_logs, early_stop=3)
    out_one = _build().run(model="gpjax", optimizer="grid",
                           grid_logs=grid_logs, early_stop=3)
    assert out_mesh["conv_int"] == out_one["conv_int"]
    np.testing.assert_allclose(out_mesh["u"], out_one["u"], rtol=1e-10)


def test_checkpoint_resume_nngp(tmp_path):
    p_full = _build()
    out_full = p_full.run(model="nngp", nn=10, optimizer="grid", early_stop=4)

    p_int = _build()
    p_int.run(model="nngp", nn=10, optimizer="grid", store_int=True,
              int_dir=str(tmp_path), early_stop=2)
    ckpt_dir = os.path.join(str(tmp_path), f"{p_int.ode_name}_{p_int.N}_NNGP_int")
    ckpts = sorted(os.listdir(ckpt_dir), key=lambda s: int(s.rsplit("_", 1)[-1]))
    ckpt = os.path.join(ckpt_dir, ckpts[-1])

    p_res = _build()
    out_res = p_res.load_int_dump(ckpt, model="nngp", nn=10, optimizer="grid",
                                  early_stop=4)
    assert out_res["k"] == out_full["k"]
    np.testing.assert_allclose(out_res["u"], out_full["u"], rtol=1e-9)


def test_ckpt_rng_stream_continues():
    """Resumed runs must continue the restart-draw stream where the
    interrupted run left it — the reference's resume pickles the model's
    np Generators (models.py:262-270); ours snapshots bit_generator state
    into the checkpoint (ModelBase.get_ckpt_state)."""
    from nngparareal_tpu.models.nngp import NNGParareal

    m1 = NNGParareal(n=2, N=8, nn=5, seed=7)
    m1.rng.integers(-8, 0, size=3)  # advance the stream
    st = m1.get_ckpt_state()
    want = m1.rng.integers(-8, 0, size=5)

    m2 = NNGParareal(n=2, N=8, nn=5, seed=7)
    m2.set_ckpt_state(st)
    np.testing.assert_array_equal(m2.rng.integers(-8, 0, size=5), want)

    # legacy checkpoint without rng_state: falls back to re-seeding
    st2 = {k: v for k, v in st.items() if k != "rng_state"}
    m3 = NNGParareal(n=2, N=8, nn=5, seed=7)
    m3.rng.integers(-8, 0, size=4)
    m3.set_ckpt_state(st2)
    np.testing.assert_array_equal(
        m3.rng.integers(-8, 0, size=3),
        np.random.default_rng(7).integers(-8, 0, size=3),
    )
