#!/bin/bash
# Round-3 on-chip work queue: waits for the TPU worker to heal (it
# kernel-faulted and has been refusing backend init), then runs the
# remaining chip jobs in priority order. Every job is bounded and
# crash-resumable; the probe re-gates between steps.
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

probe
step pallas_bench 2400 python scripts/pallas_bench.py Hopf TomLab
probe
step hopf512_ds 4500 python scripts/hopf512_e2e.py 512 0 ds
probe
step bench 1500 python bench.py
probe
step gpgrid_t2 21600 bash scripts/gpgrid_tpu_loop.sh Hopf Rossler Brusselator Lorenz DblPend
probe
for i in 1 2 3 4 5 6 7 8; do
  echo "=== gp256 attempt $i $(date +%H:%M:%S)" >> "$LOG"
  timeout 5400 python scripts/run_resumable.py Hopf:256 gpjax-grid 5e-7 nf_mul=10000 score=f32 >> "$LOG" 2>&1 && break
  echo "--- gp256 attempt $i failed (rc=$?)" >> "$LOG"
  probe
done
for i in 1 2 3 4 5 6 7 8; do
  echo "=== gp512 attempt $i $(date +%H:%M:%S)" >> "$LOG"
  timeout 7200 python scripts/run_resumable.py Hopf:512 gpjax-grid 5e-7 nf_mul=10000 score=f32 >> "$LOG" 2>&1 && break
  echo "--- gp512 attempt $i failed (rc=$?)" >> "$LOG"
  probe
done
echo "CHIPQUEUE DONE $(date +%H:%M:%S)" >> "$LOG"
