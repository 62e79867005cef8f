#!/bin/bash
# Round-4 queue, part F (session 4) — gp512 resume WITH the posterior-solve
# validation fix (models/gp.py _validate_alphas), from the last healthy
# checkpoint (iter 17, 223/512 converged; the NaN-alpha iters 18-30 are
# archived under results/ckpt/archive_gp512_nan_alpha_iters18_30).
#
# gp512 has a CRAWL GUARD: after each attempt we compare the newest
# checkpoint against the attempt's start; if the run is back to
# bare-Parareal pace (< 5 converged intervals/iter over >= 2 iters) the
# fix didn't take on-chip and we stop burning the session on it.
#
# After gp512 (or its sub-deadline): the remaining round-4 validation
# queue by value-per-chip-minute, then a fresh bench.py tail.
cd /root/repo
LOG=results/logs/chipqueue.log
DEADLINE=${QUEUE_DEADLINE:-0}
GP_DEADLINE=${GP_DEADLINE:-0}
CKDIR=results/ckpt/Hopf_512_gpjax-grid_5e-07__nf_mul-10000_score-f32/Hopf_512_512_GP_int

guard() {
  [ -f /tmp/queue_deadline ] && DEADLINE=$(cat /tmp/queue_deadline)
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "CHIPQUEUE R4F deadline reached, stopping $(date +%H:%M:%S)" >> "$LOG"
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

ck_state() { # echo "<max_iter> <conv_at_max>"
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

# ---- phase 1: gp512 fixed resume, crawl-guarded -------------------------
for i in 1 2 3 4 5 6 7 8; do
  gp512_converged && { echo "gp512 CONVERGED $(date +%H:%M:%S)" >> "$LOG"; break; }
  [ -f /tmp/gp512_deadline ] && GP_DEADLINE=$(cat /tmp/gp512_deadline)
  left=$((GP_DEADLINE - $(date +%s)))
  [ "$GP_DEADLINE" -gt 0 ] && [ "$left" -le 180 ] && {
    echo "gp512 sub-deadline, parking in ckpt $(date +%H:%M:%S)" >> "$LOG"; break; }
  guard
  probe
  read -r k0 c0 <<< "$(ck_state)"
  echo "=== gp512-fixed attempt $i from iter $k0 (conv $c0, cap ${left}s) $(date +%H:%M:%S)" >> "$LOG"
  timeout "$left" python scripts/run_resumable.py Hopf:512 gpjax-grid 5e-7 \
    nf_mul=10000 score=f32 >> "$LOG" 2>&1 && continue
  echo "--- gp512-fixed attempt $i ended (rc=$?)" >> "$LOG"
  read -r k1 c1 <<< "$(ck_state)"
  di=$((k1 - k0)); dc=$((c1 - c0))
  echo "--- gp512 progress: iters +$di, conv +$dc ($c1/512 at iter $k1)" >> "$LOG"
  # Guard on the PRECISE failure signal, not pace (healthy GP runs also
  # crawl near the threshold — gp512 iters 16-17 added just +4/+8): the
  # validation prints this warning only when candidate walk + jitter
  # escalation BOTH failed, i.e. the posterior is still unusable and the
  # sweep is falling back to bare Parareal.
  nbad=$(grep -c "posterior solve unusable" "$LOG")
  if [ "$nbad" -ge 2 ]; then
    echo "--- gp512 VALIDATION-EXHAUSTED guard tripped ($nbad unusable-posterior warnings); moving on" >> "$LOG"
    break
  fi
done

# ---- phase 2: remaining round-4 validation queue ------------------------
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
step smalln_probe 2400 python scripts/smalln_probe.py 64 128
probe
step smallb_burgers 2400 python scripts/smalln_probe.py burgers
probe
for i in 1 2; do
  guard
  cap=$(clamp_to 3600)
  echo "=== nngp-time-chip attempt $i (cap ${cap}s) $(date +%H:%M:%S)" >> "$LOG"
  timeout "$cap" python scripts/run_resumable.py Lorenz nngp-time 5e-7 \
    nn=11 nn_iters=20 n_restarts=20 reps=10 tag=tpu sweep=host >> "$LOG" 2>&1 && break
  echo "--- nngp-time-chip attempt $i failed (rc=$?)" >> "$LOG"
  probe
done
probe
step microbench 3600 python scripts/microbench.py
probe
step hopf512_ds 4500 python scripts/hopf512_e2e.py 512 0 ds
probe
step bench_fresh 1500 python bench.py
echo "CHIPQUEUE R4F DONE $(date +%H:%M:%S)" >> "$LOG"
