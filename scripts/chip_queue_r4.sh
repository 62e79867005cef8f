#!/bin/bash
# Round-4 unified on-chip work queue (replaces chip_queue_master.sh).
# Priority-ordered by VERDICT r3 "Next round" so that if the chip heals
# with little round time left, the highest-value items land first:
#   1. bench.py                — fresh headline artifact (r3 weak #1)
#   2. Hopf-256/512 GP rows    — the paper's GP-cost-blow-up contrast
#                                (r3 missing #1; resumable)
#   3. pallas A/B + small-N probe — refresh MFU timings, pick the
#                                small-N mitigation winner (r3 items 4,5)
#   4. Table-2 5e-9 nnGP on-chip — validates the host_cpu precision
#                                router (r3 item 6)
#   5. nnGP-time Lorenz        — last C15 gap; retried with sweep=host
#                                (kernel-fault suspect is the fused scan)
#   6. Hopf ds scaling rows 512/128/64/32 (+min_rows at small N)
#   7. Table-2 gpjax-grid on-chip loop, across-m NM seeds, Cholesky
#      crossover, microbench
# Every job is bounded (timeout) and the probe re-gates between steps so
# a chip death mid-queue parks us back in the probe loop.
cd /root/repo
LOG=results/logs/chipqueue.log
probe() {
  until timeout 420 python -c "
import jax, jax.numpy as jnp
print(jax.devices(), flush=True)
print(float((jnp.ones((8,128))*2).sum()), flush=True)
" >> "$LOG" 2>&1; do
    echo "[probe] chip unhealthy $(date +%H:%M:%S)" >> "$LOG"
    sleep 240
  done
  echo "[probe] chip healthy $(date +%H:%M:%S)" >> "$LOG"
}
step() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== step $name start $(date +%H:%M:%S)" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "=== step $name rc=$? end $(date +%H:%M:%S)" >> "$LOG"
}
retry_resumable() { # name attempts timeout args...
  local name=$1 n=$2 to=$3; shift 3
  for i in $(seq 1 "$n"); do
    echo "=== $name attempt $i $(date +%H:%M:%S)" >> "$LOG"
    timeout "$to" python scripts/run_resumable.py "$@" >> "$LOG" 2>&1 && return 0
    echo "--- $name attempt $i failed (rc=$?)" >> "$LOG"
    probe
  done
  return 1
}

probe
step bench 1500 python bench.py
probe
step bench_fast 1500 env BENCH_SYNC=fast python bench.py
probe
retry_resumable gp256 6 5400 Hopf:256 gpjax-grid 5e-7 nf_mul=10000 score=f32
probe
retry_resumable gp512 6 7200 Hopf:512 gpjax-grid 5e-7 nf_mul=10000 score=f32
probe
step pallas_bench 2400 python scripts/pallas_bench.py
probe
step smalln_probe 3000 python scripts/smalln_probe.py 32 64 128
probe
step smallb_burgers 2400 python scripts/smalln_probe.py burgers
probe
step t2_5e9_router 14400 python scripts/table2_tpu.py 5e-9 ds nngp-grid
probe
retry_resumable nngp-time-chip 4 3600 Lorenz nngp-time 5e-7 \
  nn=11 nn_iters=20 n_restarts=20 reps=10 tag=tpu sweep=host
probe
step hopf512_ds 4500 python scripts/hopf512_e2e.py 512 0 ds
probe
step hopf128_ds 3000 python scripts/hopf512_e2e.py 128 0 ds
probe
step hopf64_ds 2400 python scripts/hopf512_e2e.py 64 0 ds
probe
step hopf32_ds 2400 python scripts/hopf512_e2e.py 32 0 ds
probe
step hopf64_mr8 2400 python scripts/hopf512_e2e.py 64 0 ds 8
probe
step gpgrid_t2 21600 bash scripts/gpgrid_tpu_loop.sh Hopf Rossler Brusselator Lorenz DblPend
probe
step across_m_nm 14400 python scripts/burgers_across_m_tpu.py 5.9 7 nm 18 14
probe
step gp_chol_f64 2400 python scripts/gp_chol_bench.py f64 32 64 128 256 512
probe
step gp_chol_f32 2400 python scripts/gp_chol_bench.py f32 32 64 128 256 512
probe
step microbench 3600 python scripts/microbench.py
echo "CHIPQUEUE R4 DONE $(date +%H:%M:%S)" >> "$LOG"
