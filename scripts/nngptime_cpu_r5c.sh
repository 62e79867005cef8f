#!/bin/bash
# nngp-time Lorenz full-config CPU chain, session-5 relaunch: fresh
# machine-local compile cache (the default .jax_cache holds XLA:CPU AOT
# entries compiled on a different machine — cpu_aot_loader SIGILL risk),
# untimed attempts, nice 15 so the chip queue's host-side work wins.
cd /root/repo
LOG=results/logs/nngptime_lorenz_cpu_r5c.log
export RESUMABLE_CPU=1
export NNGP_TPU_CACHE_DIR=/root/repo/.jax_cache_cpu_local
for i in 1 2 3 4 5 6 7 8; do
  echo "=== attempt $i $(date +%H:%M:%S)" >> "$LOG"
  nice -n 15 python scripts/run_resumable.py Lorenz nngp-time 5e-7 \
    nn=11 reps=10 nn_iters=20 n_restarts=20 verbose=v >> "$LOG" 2>&1 && break
  sleep 30
done
echo "=== chain done rc=$? $(date +%H:%M:%S)" >> "$LOG"
