"""Flagship benchmark: viscous Burgers d=128, N=128, T=5.9, nnGParareal m=18.

The headline configuration of BASELINE.md section 4 (reference
Burgers.py:27-57,117-122): epsilon=5e-7, Ng=4N, Nf=1e4*Ng, RK1 coarse /
RK8 fine, [-1,1]-normalized, nn=18. The reference solved it in 5877 s
(K=14) on a 3-node, 141-core MPI cluster.

Primary metric: end-to-end wall-clock speedup over the reference's
published runtime for the SAME problem at the SAME tolerance (runtime
excludes one-time jit compiles, which are reported separately — the
reference pays none). The classic parareal speedup-vs-own-serial S and
its ratio to the reference's 8.08 are reported in the detail line: on a
single chip S is bounded by N/K x (8-slice wall / N-slice wall), because
one chip executes every slice's fine solve itself, whereas the reference
had one core per slice.

Prints ONE JSON line:
  {"metric": ..., "value": V, "unit": "x", "vs_baseline": V}
"""

import json
import sys


BASELINE_RUNTIME_S = 5877.0  # BASELINE.md section 4, T=5.9, nnGParareal
BASELINE_SPEEDUP = 8.08
BASELINE_K = 14

# Last recorded on-chip measurement of this exact benchmark AS RUN BY
# DEFAULT (BENCH_r04.json: fine='auto' -> Pallas ds32, sync_mode='fast':
# runtime 10.604 s, K=12). Reported ONLY as an explicitly-marked stale
# fallback when the TPU worker is down at bench time (the axon worker
# sporadically kernel-faults and backend init then blocks ~25 min — long
# past any sane bench timeout).
LAST_RECORDED = {"value": 554.47, "runtime_s": 10.599, "K": 12,
                 "sync_mode": "fast"}


def _chip_healthy(timeout_s=420):
    """Bounded health probe in a subprocess (see utils/chip.py): a hung
    backend init cannot be interrupted in-process, and the probe must also
    verify the answering backend is not a silent CPU fallback — otherwise
    a CPU run would be published as an on-chip number."""
    from nngparareal_tpu.utils.chip import chip_healthy

    return chip_healthy(timeout_s)


def main():
    if not _chip_healthy():
        # Advisor round-3 (bench.py:62): never publish an unmeasured number
        # in the standard metric schema. On outage the metric line carries
        # value=null under a distinct *_STALE name and the process exits
        # nonzero; the last recorded measurement lives only in the stderr
        # detail object for humans.
        info = {
            "error": "TPU backend unavailable at bench time (worker down); "
                     "no fresh measurement. Last recorded on-chip result "
                     "of this exact benchmark is included for reference "
                     "only — it is NOT this run's value.",
            "stale_from": "BENCH_r04.json fine='auto' Pallas ds32, "
                          "sync_mode='fast' (the default configuration)",
            "last_recorded": LAST_RECORDED,
        }
        print(json.dumps({"detail": info}), file=sys.stderr)
        print(json.dumps({
            "metric": "burgers128_nngp_5e-7_wallclock_speedup_over_reference_cluster_runtime_STALE",
            "value": None,
            "unit": "x",
            "vs_baseline": None,
            "stale_chip_outage": True,
        }))
        sys.exit(3)
    import jax  # noqa: F401

    from nngparareal_tpu.utils.compile_cache import enable as enable_cache

    # round-5: the axon platform is excluded from jax's persistent-cache
    # allowlist, so the old jax_compilation_cache_dir setting silently
    # no-oped on-chip (612.9 s cold compile every bench run, VERDICT r4
    # weak #2); enable() force-marks the cache usable for the relay
    enable_cache(verbose=True)

    import numpy as np
    from nngparareal_tpu.systems import Burgers
    from nngparareal_tpu.solver import RKSolver
    from nngparareal_tpu.driver import Parareal
    from nngparareal_tpu.reporting import est_serial, calc_speedup

    N = 128
    T = 5.9
    Ng_per, Nf_per = 4, 10000 * 4  # totals Ng=4N, Nf=1e4*Ng (Burgers.py:30-31)

    ode = Burgers(d_x=128, normalization="-11")
    f = ode.get_vector_field()
    # BENCH_FINE=f64|ds|pallas|auto overrides the fine-solver arithmetic.
    # Default 'auto' (solver.select_fine_mode) resolves to the Pallas
    # whole-chunk ds32 kernel here — d=128 on TPU (10.6 us/step vs ~25 ds
    # / ~41 f64; bitwise-identical to the ds32 XLA path, K-parity with
    # f64 across the zoo — PARITY.md round 3).
    import os

    fine = os.environ.get("BENCH_FINE", "auto")
    fine_kw = {}
    if fine in ("ds", "pallas", "auto"):
        fine_kw = dict(fine_ds=ode.get_ds_vector_field(), fine=fine)
    solver = RKSolver(f, Ng=Ng_per, Nf=Nf_per, G="RK1", F="RK8", **fine_kw)
    p = Parareal(ode, solver, [0.0, T], N, epsilon=5e-7, verbose=None)

    # grid hyperopt: the TPU-native deterministic theta search (same
    # candidate support as the reference's NM random starts; K parity
    # verified on the paper systems — see PARITY.md).
    # sync_mode='fast' drops the per-phase relay syncs (~3 x 30-50 ms per
    # iteration) for one sync at the convergence check — identical
    # trajectories (tests/test_host_cpu_sweep.py), coarser timing splits
    # (the per-iteration work lands in fused_iter_s). Default since the
    # round-4 on-chip A/B: 10.71 s vs 11.49 s attrib (548.96x vs 511.4x);
    # BENCH_SYNC=attrib restores the fully-attributed splits.
    sync = os.environ.get("BENCH_SYNC", "fast")
    out = p.run(model="nngp", nn=18, seed=45, optimizer="grid",
                sync_mode=sync)

    runtime = out["timings"]["runtime"]
    serial_est = est_serial(out, N)
    own_speedup = calc_speedup(out, N=N)
    wallclock_ratio = BASELINE_RUNTIME_S / runtime

    # Apples-to-apples serial baseline: when the fine path runs reduced-
    # precision arithmetic (ds32 / Pallas), ALSO measure the f64 serial
    # fine estimate with the same batch-8 micro-batch estimator the
    # driver uses (driver.py measure_serial_fine), so the detail line can
    # report the framework's speedup over the f64 serial solve the
    # reference's own-serial number (8.08) is defined against.
    f64_serial_est = None
    if fine != "f64":
        import time as _time

        import jax.numpy as jnp

        s64 = RKSolver(f, Ng=Ng_per, Nf=Nf_per, G="RK1", F="RK8")
        bm = 8
        t0s = jnp.full(bm, 0.0)
        t1s = jnp.full(bm, T / N)
        U = jnp.tile(jnp.asarray(ode.get_init_cond()), (bm, 1))
        # sync via host fetch, not block_until_ready: through the axon
        # relay block_until_ready has returned ~0s for some executables
        # (the round-2 microbench anomaly) — a device->host transfer is
        # the one sync the relay cannot elide
        np.asarray(s64.run_F_batch(t0s, t1s, U))  # compile + warm
        t0 = _time.perf_counter()
        np.asarray(s64.run_F_batch(t0s, t1s, U))
        f64_serial_est = (_time.perf_counter() - t0) * N

    info = {
        "fine": fine,
        "fine_resolved": getattr(solver, "_fine_mode_resolved", fine),
        "K": out["k"],
        "converged": bool(out["converged"]),
        "runtime_s": round(runtime, 3),
        "reference_runtime_s": BASELINE_RUNTIME_S,
        "est_serial_s": round(serial_est, 3),
        "speedup_vs_own_serial": round(float(own_speedup), 3),
        "own_serial_speedup_vs_baseline_8.08": round(
            float(own_speedup) / BASELINE_SPEEDUP, 4
        ),
        "est_f64_serial_s": (round(f64_serial_est, 3)
                             if f64_serial_est is not None else None),
        "speedup_vs_f64_serial": (round(f64_serial_est / runtime, 3)
                                  if f64_serial_est is not None else None),
        "F_time_s": round(out["timings"]["F_time"], 3),
        "G_time_s": round(out["timings"]["G_time"], 3),
        "mdl_tot_s": round(out["timings"]["mdl_tot_t"], 3),
        "overhead_s": round(out["timings"].get("overhead_t", 0.0), 3),
        "sync_mode": out["timings"].get("sync_mode", "attrib"),
        "fused_iter_s": round(out["timings"].get("fused_iter_t", 0.0), 3),
        "jit_compile_s": round(out["timings"].get("warmup_t", 0.0), 3),
        "warmup_split": out["timings"].get("warmup_split"),
        "persist_cache": True,
        "total_wall_s": round(out["timings"].get("total_wall", 0.0), 3),
        "baseline": {"K": BASELINE_K, "speedup": BASELINE_SPEEDUP,
                     "runtime_s": BASELINE_RUNTIME_S},
    }
    print(json.dumps({"detail": info}), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "burgers128_nngp_5e-7_wallclock_speedup_over_reference_cluster_runtime",
                "value": round(float(wallclock_ratio), 2),
                "unit": "x",
                "vs_baseline": round(float(wallclock_ratio), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
