#!/bin/bash
# Round-5 queue part B — runs after chip_queue_r5.sh exits (a waiter loop
# launches this). Stretch items:
#   1. TomLab GParareal scaling rows N=64/128 (VERDICT next #10): extend
#      the GP-cost contrast to a second system (reference TomLab.py:106-116
#      ran GP here too; DNF at 512).
#   2. FHN_ODE 5e-9 bare-parareal fine=ds row: attribution for the one
#      router-table row outside the +/-1 band (PARITY round-5 note) — if
#      bare K inflates vs CPU's 14 with the ds32 fine, the gap is the fine
#      path, measured, not the sweep.
cd /root/repo
LOG=results/logs/chipqueue.log
DEADLINE=0

guard() {
  [ -f /tmp/queue_deadline ] && DEADLINE=$(cat /tmp/queue_deadline)
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "CHIPQUEUE R5B deadline reached, stopping $(date +%H:%M:%S)" >> "$LOG"
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
    guard
    sleep 240
  done
  echo "[probe] chip healthy $(date +%H:%M:%S)" >> "$LOG"
}
clamp_to() {
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
  if [ -f /tmp/queue_skip ] && grep -qx "$name" /tmp/queue_skip; then
    echo "=== step $name SKIPPED by /tmp/queue_skip $(date +%H:%M:%S)" >> "$LOG"
    return
  fi
  to=$(clamp_to "$to")
  echo "=== step $name start (cap ${to}s) $(date +%H:%M:%S)" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "=== step $name rc=$? end $(date +%H:%M:%S)" >> "$LOG"
}

echo "CHIPQUEUE R5B starting $(date +%H:%M:%S)" >> "$LOG"
probe
step fhn5e9_bare_ds 1800 python scripts/run_resumable.py FHN_ODE parareal 5e-9 \
  fine=ds tag=tpu
probe
step tomlab_gp64_a1 3000 python scripts/run_resumable.py TomLab:64 gpjax-grid 5e-7 \
  score=f32
probe
step tomlab_gp64_a2 3000 python scripts/run_resumable.py TomLab:64 gpjax-grid 5e-7 \
  score=f32
probe
step tomlab_gp128_a1 3600 python scripts/run_resumable.py TomLab:128 gpjax-grid 5e-7 \
  score=f32
probe
step tomlab_gp128_a2 3600 python scripts/run_resumable.py TomLab:128 gpjax-grid 5e-7 \
  score=f32
echo "CHIPQUEUE R5B DONE $(date +%H:%M:%S)" >> "$LOG"
