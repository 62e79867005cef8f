#!/bin/bash
# Round-5 final-session queue (session 5, Aug 20 evening). Remaining
# VERDICT round-4 items that lost the chip lottery in the morning queue:
#   1. bench.py TWICE back-to-back (next #6: second run's jit_compile_s
#      measures the persistent-cache floor after the jax.extend fix).
#   2. Hopf N=32/64/128 end-to-end ds rows (next #5).
#   3. pallas_bench + microbench f64 re-measure (next #9: kill the 0.0 s
#      sync-anomaly asterisk).
#   4. across-m NM seeds 5.. to extend the band toward n>=10 (next #8),
#      time-boxed last.
#   5. TomLab GP N=64 (next #10, stretch).
cd /root/repo
LOG=results/logs/chipqueue.log
DEADLINE=0

guard() {
  [ -f /tmp/queue_deadline ] && DEADLINE=$(cat /tmp/queue_deadline)
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "CHIPQUEUE R5C deadline reached, stopping $(date +%H:%M:%S)" >> "$LOG"
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

echo "CHIPQUEUE R5C starting $(date +%H:%M:%S)" >> "$LOG"
probe
step bench_1 1500 python bench.py
probe
step bench_2 900 python bench.py
probe
step hopf32_ds 900 python scripts/hopf512_e2e.py 32 0 ds
probe
step hopf64_ds 1200 python scripts/hopf512_e2e.py 64 0 ds
probe
step hopf128_ds 1800 python scripts/hopf512_e2e.py 128 0 ds
probe
step pallas_bench 1800 python scripts/pallas_bench.py
probe
step microbench 2400 python scripts/microbench.py
probe
step acrossm_nm5 3600 python scripts/burgers_across_m_tpu.py 5.9 2 nm 18 5
probe
step acrossm_nm7 3600 python scripts/burgers_across_m_tpu.py 5.9 2 nm 18 7
probe
step acrossm_nm9 3600 python scripts/burgers_across_m_tpu.py 5.9 1 nm 18 9
probe
step tomlab_gp64 3000 python scripts/run_resumable.py TomLab:64 gpjax-grid 5e-7 \
  score=f32
echo "CHIPQUEUE R5C DONE $(date +%H:%M:%S)" >> "$LOG"
