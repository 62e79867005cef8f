#!/bin/bash
# Round-4 queue, part G (session 5) — gp512 solo resume from iter 19.
#
# Post-mortem of part F: TWO copies of the r4f queue ran concurrently
# (stale pidfile), each resuming gp512 from iter 17 and contending for
# the chip; both contending iter-18 fits failed posterior validation
# ("unusable" warnings), but the surviving solo run's iter-19 fit
# PASSED and conv moved 224 -> 228.  CPU scipy replication of the
# ckpt-17 solve (scripts/dev/gp512_alpha_diag2.py) gives rel residuals
# ~1e-14 at the stored thetas, so the model state is healthy and the
# validation fix works when one process owns the chip.
#
# Warning guard here counts only warnings NEW since the attempt start
# (r4f grep-ed the whole log, which already held 2 from the duplicate
# era and would have tripped immediately).
cd /root/repo
LOG=results/logs/chipqueue.log
DEADLINE=${QUEUE_DEADLINE:-0}
GP_DEADLINE=${GP_DEADLINE:-0}

guard() {
  [ -f /tmp/queue_deadline ] && DEADLINE=$(cat /tmp/queue_deadline)
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "CHIPQUEUE R4G deadline reached, stopping $(date +%H:%M:%S)" >> "$LOG"
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

# ---- phase 1: gp512 solo resume -----------------------------------------
for i in 1 2 3 4 5 6 7 8; do
  gp512_converged && { echo "gp512 CONVERGED $(date +%H:%M:%S)" >> "$LOG"; break; }
  [ -f /tmp/gp512_deadline ] && GP_DEADLINE=$(cat /tmp/gp512_deadline)
  left=$((GP_DEADLINE - $(date +%s)))
  [ "$GP_DEADLINE" -gt 0 ] && [ "$left" -le 300 ] && {
    echo "gp512 sub-deadline, parking in ckpt $(date +%H:%M:%S)" >> "$LOG"; break; }
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

# ---- phase 2: remaining round-4 validation queue ------------------------
probe
step t2_5e9_router 5400 python scripts/table2_tpu.py 5e-9 ds nngp-grid
probe
step hopf128_ds 2400 python scripts/hopf512_e2e.py 128 0 ds
probe
step hopf64_ds 1800 python scripts/hopf512_e2e.py 64 0 ds
probe
step hopf32_ds 1800 python scripts/hopf512_e2e.py 32 0 ds
probe
step pallas_bench 2400 python scripts/pallas_bench.py
probe
step gp_chol_f64 2400 python scripts/gp_chol_bench.py f64 32 64 128 256 512
probe
step gp_chol_f32 1800 python scripts/gp_chol_bench.py f32 32 64 128 256 512
probe
step microbench 3000 python scripts/microbench.py
probe
step hopf512_ds 3600 python scripts/hopf512_e2e.py 512 0 ds
probe
step bench_fresh 1500 python bench.py
echo "CHIPQUEUE R4G DONE $(date +%H:%M:%S)" >> "$LOG"
