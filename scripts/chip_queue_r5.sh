#!/bin/bash
# Round-5 chip queue. Order = VERDICT round-5 priorities:
#   0. Cholesky crossover bench (VERDICT weak #5 / next #7) FIRST — if the
#      lane path wins at gp512's Gram sizes the score_lanes default is
#      flipped before the resume, cutting every remaining gp512 iteration.
#   1. gp512 solo resume from ckpt 28 (241/512) until converged (next #1).
#      Also the live test of the round-4 warning-semantics fix (next #2):
#      a healthy resume must print ZERO unusable-posterior warnings.
#   2. nngp-time Lorenz on-chip, sweep=host (next #4, slipped 3 rounds).
#   3. Hopf 128/64/32 end-to-end ds timing rows (next #5).
#   4. across-m NM seeds 5..10 on-chip (next #8).
#   5. pallas_bench + microbench f64 re-measure (next #9).
#   6. hopf512 ds row, then bench.py TWICE back-to-back (next #6: second
#      run's jit_compile_s is the persistent-cache floor measurement).
cd /root/repo
LOG=results/logs/chipqueue.log
DEADLINE=${QUEUE_DEADLINE:-0}
GP_DEADLINE=${GP_DEADLINE:-0}

guard() {
  [ -f /tmp/queue_deadline ] && DEADLINE=$(cat /tmp/queue_deadline)
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "CHIPQUEUE R5 deadline reached, stopping $(date +%H:%M:%S)" >> "$LOG"
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
  # skip-file lets the supervisor drop queued steps without killing the queue
  if [ -f /tmp/queue_skip ] && grep -qx "$name" /tmp/queue_skip; then
    echo "=== step $name SKIPPED by /tmp/queue_skip $(date +%H:%M:%S)" >> "$LOG"
    return
  fi
  to=$(clamp_to "$to")
  echo "=== step $name start (cap ${to}s) $(date +%H:%M:%S)" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "=== step $name rc=$? end $(date +%H:%M:%S)" >> "$LOG"
}

ck_state() {
  python - <<'PYEOF'
import glob, pickle
fs = glob.glob('results/ckpt/Hopf_512_gpjax-grid_5e-07__nf_mul-10000_score-f32/Hopf_512_512_GP_int/*_int_*')
if not fs:
    print('-1 0')
else:
    f = max(fs, key=lambda s: int(s.rsplit('_', 1)[-1]))
    d = pickle.load(open(f, 'rb'))
    print(d['k'], d['conv_int'][-1])
PYEOF
}

gp512_converged() {
  python - <<'PYEOF'
import json, sys
rows = json.load(open('results/resumable_runs.json'))
ok = any(r.get('system') == 'Hopf' and r.get('N') == 512
         and r.get('model') == 'gpjax-grid' and r.get('converged')
         for r in rows)
sys.exit(0 if ok else 1)
PYEOF
}

# ---- phase 0: cholesky crossover at gp512 Gram sizes ---------------------
probe
step gp_chol_f32_big 1800 python scripts/gp_chol_bench.py f32 512 1024 2048 4096
# builder watches this result and may flip score_lanes default / write
# /tmp/queue_skip between steps; each gp512 attempt is a fresh process so
# code changes between attempts take effect.

# ---- phase 1: gp512 solo resume until converged --------------------------
for i in 1 2 3 4 5 6 7 8 9 10 11 12; do
  gp512_converged && { echo "gp512 CONVERGED $(date +%H:%M:%S)" >> "$LOG"; break; }
  [ -f /tmp/gp512_deadline ] && GP_DEADLINE=$(cat /tmp/gp512_deadline)
  if [ "$GP_DEADLINE" -gt 0 ]; then
    left=$((GP_DEADLINE - $(date +%s)))
    [ "$left" -le 300 ] && {
      echo "gp512 sub-deadline, parking in ckpt $(date +%H:%M:%S)" >> "$LOG"; break; }
  else
    left=8000
  fi
  [ "$left" -gt 8000 ] && left=8000
  guard
  probe
  read -r k0 c0 <<< "$(ck_state)"
  w0=$(grep -c "posterior solve unusable" "$LOG")
  echo "=== gp512-solo attempt $i from iter $k0 (conv $c0, cap ${left}s) $(date +%H:%M:%S)" >> "$LOG"
  timeout "$left" python scripts/run_resumable.py Hopf:512 gpjax-grid 5e-7 \
    nf_mul=10000 score=f32 >> "$LOG" 2>&1 && continue
  echo "--- gp512-solo attempt $i ended (rc=$?)" >> "$LOG"
  read -r k1 c1 <<< "$(ck_state)"
  echo "--- gp512 progress: iters $k0->$k1, conv $c0->$c1 ($c1/512)" >> "$LOG"
  w1=$(grep -c "posterior solve unusable" "$LOG")
  if [ $((w1 - w0)) -ge 3 ]; then
    echo "--- gp512 VALIDATION-EXHAUSTED guard: $((w1-w0)) new unusable-posterior warnings this attempt; moving on" >> "$LOG"
    break
  fi
done

# ---- phase 2: nngp-time Lorenz on-chip (sweep=host) ----------------------
probe
step nngptime_a1 3600 python scripts/run_resumable.py Lorenz nngp-time 5e-7 \
  nn=11 reps=10 nn_iters=20 n_restarts=20 sweep=host tag=tpu
probe
step nngptime_a2 3600 python scripts/run_resumable.py Lorenz nngp-time 5e-7 \
  nn=11 reps=10 nn_iters=20 n_restarts=20 sweep=host tag=tpu

# ---- phase 3: Hopf small-N end-to-end timing rows ------------------------
probe
step hopf128_ds 2400 python scripts/hopf512_e2e.py 128 0 ds
probe
step hopf64_ds 1800 python scripts/hopf512_e2e.py 64 0 ds
probe
step hopf32_ds 1800 python scripts/hopf512_e2e.py 32 0 ds

# ---- phase 4: across-m NM seed band to n>=10 ------------------------------
probe
step acrossm_nm 6600 python scripts/burgers_across_m_tpu.py 5.9 6 nm 18 5

# ---- phase 5: microbench re-measures -------------------------------------
probe
step pallas_bench 2400 python scripts/pallas_bench.py
probe
step microbench 3000 python scripts/microbench.py

# ---- phase 6: hopf512 nngp ds row + compile-floor double bench ------------
probe
step hopf512_ds 3600 python scripts/hopf512_e2e.py 512 0 ds
probe
step bench_1 1500 python bench.py
probe
step bench_2 1500 python bench.py
echo "CHIPQUEUE R5 DONE $(date +%H:%M:%S)" >> "$LOG"
