"""Experiment-level parallelism: whole-system runs fanned over spawned
CPU worker processes (the reference's ``pool.map(do, systems)``,
Table_2.py:46; SURVEY section 2.3 axis 4).

Slow (spawns a fresh jax process per system): gated behind RUN_SLOW.
"""

import os

import pytest

RUN_SLOW = os.environ.get("RUN_SLOW", "0") == "1"


@pytest.mark.skipif(not RUN_SLOW, reason="spawns jax workers (set RUN_SLOW=1)")
def test_table2_pool_matches_sequential():
    from nngparareal_tpu.experiments import run_table2

    kw = dict(models=("parareal",), results_dir=None, systems=["FHN_ODE"])
    seq = run_table2(**kw)
    par = run_table2(pool=2, **kw)
    assert [r["system"] for r in par] == ["FHN_ODE"]
    # deterministic pipeline: the spawned-worker run must reproduce the
    # in-process K exactly (serial/parallel equivalence discipline,
    # reference parareal.py:28-33) — and both the published K=11
    assert par[0]["runs"][0]["k"] == seq[0]["runs"][0]["k"] == 11


def test_table2_systems_filter_and_pool_mesh_exclusive():
    from nngparareal_tpu.experiments import run_table2, _TABLE2_SYSTEMS

    # unknown name selects nothing; no runs executed
    assert run_table2(results_dir=None, systems=["nope"]) == []
    with pytest.raises(ValueError):
        run_table2(results_dir=None, systems=["nope"], pool=2, mesh=object())
