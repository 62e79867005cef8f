#!/bin/bash
# Follow-up chip queue (launch AFTER chip_queue.sh finishes):
#   - extend the Burgers across-m NM seed band at m=18 to 10 seeds
#   - Hopf N=64/128 scaling rows on the ds-packed fine path (the packed
#     layout removes the degenerate 1-D-row shapes that made small-N
#     Hopf wall-inefficient in round 2)
cd /root/repo
LOG=results/logs/chipqueue2.log
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
step hopf64_ds 2400 python scripts/hopf512_e2e.py 64 0 ds
probe
step hopf128_ds 3000 python scripts/hopf512_e2e.py 128 0 ds
probe
# on-chip nnGP-time green run (round-2 crash item): resumable, Lorenz
for i in 1 2 3 4; do
  echo "=== nngp-time-chip attempt $i $(date +%H:%M:%S)" >> "$LOG"
  timeout 3600 python scripts/run_resumable.py Lorenz nngp-time 5e-7 \
    nn=11 nn_iters=20 n_restarts=20 reps=10 tag=tpu >> "$LOG" 2>&1 && break
  echo "--- nngp-time-chip attempt $i failed (rc=$?)" >> "$LOG"
  probe
done
probe
step across_m_nm 14400 python scripts/burgers_across_m_tpu.py 5.9 7 nm 18 3
echo "CHIPQUEUE2 DONE $(date +%H:%M:%S)" >> "$LOG"
