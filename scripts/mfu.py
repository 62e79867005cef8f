"""MFU / roofline accounting for the hot kernels (VERDICT r3 item 4).

FLOPs are NOT hand-estimated: each kernel's one-step (or one-call) body is
traced at its production fan-out shape and counted primitive-by-primitive
from the jaxpr (nngparareal_tpu/utils/flops.py). Combined with the
measured steady-state timings from scripts/pallas_bench.py /
scripts/microbench.py (BENCHMARKS.md), this yields achieved FLOP/s and
%-of-peak per kernel.

Roofline model (single TPU v5e chip):
  * published peak: 197 TFLOP/s bf16 (MXU). With 4 MXUs of 128x128 MACs,
    that pins the TensorCore clock at 197e12/(128*128*2*4) = 1.50 GHz.
  * the RK kernels are ELEMENTWISE (VPU) work — stencil adds, axpys,
    compensated-arithmetic chains. The VPU is (8 sublanes x 128 lanes)
    x 4 ALUs per core, so at the derived clock:
       VPU issue peak  = 1024 * 4 * 1.50e9          =  6.2 T f32 op/s
       VPU FMA peak    = 2x (every op an FMA)       = 12.3 TFLOP/s
    We report MFU against the ISSUE peak: jaxpr counting counts mul and
    add separately (no FMA credit), so flops/issue-peak is the honest
    "fraction of VPU issue slots doing useful arithmetic".
  * f64 on TPU is software-emulated; for f64 kernels we report LOGICAL
    f64 flops (the ds32 row shows the native-op expansion factor, ~16x).

Timing provenance: stored measurements from the last healthy-chip run
(BENCHMARKS.md round 3). Rerun scripts/pallas_bench.py on a healthy chip
and update MEASURED_US_PER_STEP to refresh.

Usage: python scripts/mfu.py   (CPU-only; writes results/mfu.json)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from nngparareal_tpu.utils.flops import flops_of
from nngparareal_tpu.systems import Burgers, Hopf, ThomasLabyrinth
from nngparareal_tpu.ops.rk import rk_step
from nngparareal_tpu.ops.rk_ds import rk_step_ds

# ---- v5e roofline constants (derivation in the module docstring) ----
PEAK_BF16 = 197e12
CLOCK = PEAK_BF16 / (128 * 128 * 2 * 4)          # 1.503 GHz
VPU_ISSUE = 8 * 128 * 4 * CLOCK                  # 6.16e12 f32 op/s
VPU_FMA = 2 * VPU_ISSUE                          # 12.3e12 FLOP/s
HBM_BW = 8.19e11                                 # 819 GB/s (public v5e)

# ---- measured steady-state us per fan-out step (BENCHMARKS.md) ----
# keys: (system, path);  f64 Burgers row is the round-1 op-issue bound
# (the round-3 rerun printed 0.0s — known sync anomaly, asterisked).
MEASURED_US_PER_STEP = {
    ("burgers", "f64"): (41.0, "round-1 measurement (round-3 rerun hit the sync anomaly)"),
    ("burgers", "ds32"): (25.3, "scripts/pallas_bench.py round 3"),
    ("burgers", "pallas"): (10.6, "scripts/pallas_bench.py round 3"),
    ("hopf", "f64"): (11.8, "scripts/pallas_bench.py round 3"),
    ("hopf", "ds32"): (10.2, "scripts/pallas_bench.py round 3"),
    ("hopf", "pallas"): (72.9, "scripts/pallas_bench.py round 3"),
    ("tomlab", "f64"): (16.6, "scripts/pallas_bench.py round 3"),
    ("tomlab", "ds32"): (9.4, "scripts/pallas_bench.py round 3"),
    ("tomlab", "pallas"): (37.1, "scripts/pallas_bench.py round 3"),
}
# lane-major batched NLL: 576 (theta,jitter) combos x 128 coords, m=18
NLL_MS = (14.0, "scripts/microbench.py round 3 (~14 ms)")


def _count_f64(ode, tab, B, d):
    f = ode.get_vector_field()
    fB = jax.vmap(f, in_axes=(None, 0))
    U = jax.ShapeDtypeStruct((B, d), jnp.float64)
    return flops_of(lambda u: rk_step(fB, tab, 0.0, u, 1e-5), U)


def _count_ds(ode, tab, B, d, packed):
    fds = ode.get_ds_vector_field()
    if packed:
        fT = jax.vmap(fds, in_axes=(None, (1, 1)), out_axes=(1, 1))
        fB = jax.vmap(fT, in_axes=(None, (1, 1)), out_axes=(1, 1))
        rows = -(-B // 128)
        shape = (d, rows, 128)
    else:
        fB = jax.vmap(fds, in_axes=(None, (0, 0)), out_axes=(0, 0))
        shape = (B, d)
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    return flops_of(
        lambda uh, ul: rk_step_ds(fB, tab, 0.0, uh, ul, 1e-5), spec, spec
    )


def _count_nll(m=18, r=128, Bt=576):
    from nngparareal_tpu.ops import gp_lanes

    sqd = jax.ShapeDtypeStruct((m, m), jnp.float64)
    Y = jax.ShapeDtypeStruct((m, r), jnp.float64)
    th = jax.ShapeDtypeStruct((Bt, 2), jnp.float64)
    jp = jax.ShapeDtypeStruct((Bt,), jnp.float64)
    mask = jax.ShapeDtypeStruct((m,), jnp.float64)
    return flops_of(gp_lanes.nll_lanes, sqd, Y, th, jp, mask)


def main():
    systems = {
        "burgers": (Burgers(d_x=128, normalization="-11"), "RK8", 128, 128,
                    False),
        "hopf": (Hopf(normalization="-11"), "RK8", 512, 3, True),
        "tomlab": (ThomasLabyrinth(normalization="-11"), "RK4", 512, 3,
                   True),
    }
    rows = []
    for name, (ode, tab, B, d, packed) in systems.items():
        c64 = _count_f64(ode, tab, B, d)
        cds = _count_ds(ode, tab, B, d, packed)
        for path, cnt, unit in (("f64", c64, "f64(logical)"),
                                ("ds32", cds, "f32(native)"),
                                ("pallas", cds, "f32(native)")):
            us, prov = MEASURED_US_PER_STEP[(name, path)]
            flops = int(cnt["flops"])  # per fan-out step, ALL B slices
            achieved = flops / (us * 1e-6)
            rows.append({
                "kernel": f"{name} fine {path}",
                "shape": f"B={B} d={d} {tab}",
                "flops_per_fanout_step": flops,
                "flop_unit": unit,
                "measured_us_per_step": us,
                "achieved_flops_per_s": achieved,
                "pct_vpu_issue_peak": round(100 * achieved / VPU_ISSUE, 2),
                "pct_vpu_fma_peak": round(100 * achieved / VPU_FMA, 2),
                "transcendental_per_step": int(cnt["transcendental"]),
                "div_per_step": int(cnt["div"]),
                "timing_provenance": prov,
            })

    cn = _count_nll()
    ms, prov = NLL_MS
    achieved = cn["flops"] / (ms * 1e-3)
    rows.append({
        "kernel": "lane-major batched NLL (GP hyperopt inner op)",
        "shape": "m=18, 576 tasks x 128 coords",
        "flops_per_fanout_step": int(cn["flops"]),
        "flop_unit": "f64(logical)",
        "measured_us_per_step": ms * 1000,
        "achieved_flops_per_s": achieved,
        "pct_vpu_issue_peak": round(100 * achieved / VPU_ISSUE, 2),
        "pct_vpu_fma_peak": round(100 * achieved / VPU_FMA, 2),
        "transcendental_per_step": int(cn["transcendental"]),
        "div_per_step": int(cn["div"]),
        "timing_provenance": prov,
    })

    out = {
        "roofline": {
            "peak_bf16_flops": PEAK_BF16,
            "derived_clock_hz": CLOCK,
            "vpu_issue_peak_f32_ops": VPU_ISSUE,
            "vpu_fma_peak_flops": VPU_FMA,
            "hbm_bytes_per_s": HBM_BW,
            "note": "clock derived from published 197 TF bf16 over 4x "
                    "128x128 MXUs; VPU = 8x128 lanes x 4 ALUs at that "
                    "clock; MFU reported against the no-FMA issue peak "
                    "(jaxpr counting gives no FMA credit)",
        },
        "rows": rows,
    }
    os.makedirs("results", exist_ok=True)
    with open("results/mfu.json", "w") as fh:
        json.dump(out, fh, indent=1)

    hdr = ("| kernel | shape | flops/step | unit | us/step | achieved "
           "| % VPU issue | % VPU FMA |")
    print(hdr)
    print("|" + "---|" * 8)
    for r in rows:
        print(
            f"| {r['kernel']} | {r['shape']} | "
            f"{r['flops_per_fanout_step']:,} | {r['flop_unit']} | "
            f"{r['measured_us_per_step']:.1f} | "
            f"{r['achieved_flops_per_s']/1e12:.3f} T/s | "
            f"{r['pct_vpu_issue_peak']}% | {r['pct_vpu_fma_peak']}% |"
        )


if __name__ == "__main__":
    main()
