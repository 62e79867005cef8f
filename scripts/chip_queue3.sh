#!/bin/bash
# Third on-chip queue (launch AFTER chip_queue2.sh finishes):
#   - full-GP NLL scoring crossover: row-major XLA cholesky vs the
#     blocked lane-major path (decides GParareal score_lanes cutover)
#   - microbench re-run with the relay-proof host-fetch sync (validates
#     the round-2 "0.000s" anomaly fix on-chip)
cd /root/repo
LOG=results/logs/chipqueue3.log
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
step() {
  local name=$1 to=$2; shift 2
  echo "=== step $name start $(date +%H:%M:%S)" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "=== step $name rc=$? end $(date +%H:%M:%S)" >> "$LOG"
}
probe
step gp_chol_f64 2400 python scripts/gp_chol_bench.py f64 32 64 128 256 512
probe
step gp_chol_f32 2400 python scripts/gp_chol_bench.py f32 32 64 128 256 512
probe
step microbench 3600 python scripts/microbench.py
echo "CHIPQUEUE3 DONE $(date +%H:%M:%S)" >> "$LOG"
