#!/bin/bash
# Round-4 queue, part B — the post-gp512 remainder of chip_queue_r4.sh,
# REORDERED (again, under the 14:00 deadline) by value-per-chip-minute:
#   1. BENCH_SYNC=fast A/B — 25 min cap; if it wins, the bench.py default
#                           flips and the round-end headline improves
#   2. nnGP-time Lorenz   — the last partial component (C15); 2 bounded
#                           attempts (checkpoints accumulate across them)
#   3. small-N probe      — pick the min_rows winner (item 5)
#   4. Table-2 5e-9 nnGP  — validates the host_cpu precision router
#                           (item 6 done-criterion; rows dump per-system,
#                           so a deadline clamp still keeps partials)
#   5. Hopf ds rows 128/64/32 — the missing BENCHMARKS timing rows
#   6. pallas_bench       — refresh MFU timing inputs (item 4)
#   7. Cholesky crossover — score_lanes default decision (weak #5)
#   8. microbench         — 0.0-s sync-anomaly validation (weak #6)
#   9. long tails: Burgers small-B, hopf512 ds re-run, mr8 A/B, gpgrid
#      Table-2 loop, across-m NM seeds
# Same bounded-step + re-probe structure as chip_queue_r4.sh.
cd /root/repo
LOG=results/logs/chipqueue.log
# Hard deadline (epoch seconds, env QUEUE_DEADLINE): no NEW step starts
# after it, so the round-end driver bench gets the chip uncontended.
# /tmp/queue_deadline (epoch seconds), if present, overrides the env at
# every guard — lets a later session extend/shrink the window for a
# queue that is already running.
DEADLINE=${QUEUE_DEADLINE:-0}
guard() {
  [ -f /tmp/queue_deadline ] && DEADLINE=$(cat /tmp/queue_deadline)
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "CHIPQUEUE R4B deadline reached, stopping $(date +%H:%M:%S)" >> "$LOG"
    exit 0
  fi
}
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
clamp_to() { # echo min(timeout, seconds-to-deadline)
  local to=$1
  if [ "$DEADLINE" -gt 0 ]; then
    local left=$((DEADLINE - $(date +%s)))
    [ "$left" -lt "$to" ] && to=$left
  fi
  echo "$to"
}
step() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  guard
  to=$(clamp_to "$to")
  echo "=== step $name start (cap ${to}s) $(date +%H:%M:%S)" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "=== step $name rc=$? end $(date +%H:%M:%S)" >> "$LOG"
}
retry_resumable() { # name attempts timeout args...
  local name=$1 n=$2 to=$3; shift 3
  for i in $(seq 1 "$n"); do
    guard
    local cap; cap=$(clamp_to "$to")
    echo "=== $name attempt $i (cap ${cap}s) $(date +%H:%M:%S)" >> "$LOG"
    timeout "$cap" python scripts/run_resumable.py "$@" >> "$LOG" 2>&1 && return 0
    echo "--- $name attempt $i failed (rc=$?)" >> "$LOG"
    probe
  done
  return 1
}

probe
step bench_fast 1500 env BENCH_SYNC=fast python bench.py
probe
retry_resumable nngp-time-chip 2 3600 Lorenz nngp-time 5e-7 \
  nn=11 nn_iters=20 n_restarts=20 reps=10 tag=tpu sweep=host
probe
step smalln_probe 3000 python scripts/smalln_probe.py 32 64 128
probe
step t2_5e9_router 7200 python scripts/table2_tpu.py 5e-9 ds nngp-grid
probe
step hopf128_ds 3000 python scripts/hopf512_e2e.py 128 0 ds
probe
step hopf64_ds 2400 python scripts/hopf512_e2e.py 64 0 ds
probe
step hopf32_ds 2400 python scripts/hopf512_e2e.py 32 0 ds
probe
step pallas_bench 2400 python scripts/pallas_bench.py
probe
step gp_chol_f64 2400 python scripts/gp_chol_bench.py f64 32 64 128 256 512
probe
step gp_chol_f32 2400 python scripts/gp_chol_bench.py f32 32 64 128 256 512
probe
step microbench 3600 python scripts/microbench.py
probe
# gp512 finisher: if the 11:45 sub-deadline parked it unconverged, the
# checkpoints carry straight on here (resumable, cheap if already done)
retry_resumable gp512-finish 2 5400 Hopf:512 gpjax-grid 5e-7 nf_mul=10000 score=f32
probe
step smallb_burgers 2400 python scripts/smalln_probe.py burgers
probe
step hopf512_ds 4500 python scripts/hopf512_e2e.py 512 0 ds
probe
step hopf64_mr8 2400 python scripts/hopf512_e2e.py 64 0 ds 8
probe
step gpgrid_t2 21600 bash scripts/gpgrid_tpu_loop.sh Hopf Rossler Brusselator Lorenz DblPend
probe
step across_m_nm 14400 python scripts/burgers_across_m_tpu.py 5.9 7 nm 18 14
echo "CHIPQUEUE R4B DONE $(date +%H:%M:%S)" >> "$LOG"
