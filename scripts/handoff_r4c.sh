#!/bin/bash
# Round-4 supervisor, take 2 (replaces handoff_r4b.sh mid-flight).
#
# Rationale for the re-cut: gp256's convergence history shows the grid
# GP crawls (+1 interval/iter) late and then avalanches to full
# convergence within a few iterations; gp512 is in that crawl now
# (233/512 at iter 22, ~13 min/iter). Cutting it at 11:45 would park it
# ~3 iterations short of the likely avalanche and the part-B tail
# finisher would never be reached before the 15:30 queue deadline — so
# the VERDICT's top item (the N=512 GP scaling row) would miss the
# round. New sub-deadline: GP512_DEADLINE (default 13:15), then exec
# part B, which reads /tmp/queue_deadline (15:30) at every guard.
cd /root/repo
LOG=results/logs/chipqueue.log
GP_PID=${1:?pid of in-flight gp512 python}
GP_DEADLINE=${GP512_DEADLINE:-$(date -d "today 13:15" +%s)}

converged() {
  python - <<'EOF'
import json, sys
rows = json.load(open('results/resumable_runs.json'))
ok = any(r.get('system') == 'Hopf' and r.get('N') == 512
         and r.get('model') == 'gpjax-grid' and r.get('converged')
         for r in rows)
sys.exit(0 if ok else 1)
EOF
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

echo "=== handoff2: supervising gp512 (pid $GP_PID, sub-deadline $(date -d @$GP_DEADLINE +%H:%M)) $(date +%H:%M:%S)" >> "$LOG"
while kill -0 "$GP_PID" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$GP_DEADLINE" ]; then
    echo "=== handoff2: gp512 sub-deadline, stopping in-flight attempt $(date +%H:%M:%S)" >> "$LOG"
    kill "$GP_PID" 2>/dev/null
    sleep 30
    kill -9 "$GP_PID" 2>/dev/null
    break
  fi
  sleep 60
done

for i in 4 5 6 7; do
  converged && break
  [ "$(date +%s)" -ge "$GP_DEADLINE" ] && { echo "handoff2: gp512 sub-deadline reached, parking remaining iters in ckpt" >> "$LOG"; break; }
  probe
  echo "=== gp512 attempt $i (handoff2) $(date +%H:%M:%S)" >> "$LOG"
  left=$((GP_DEADLINE - $(date +%s))); cap=7200; [ "$left" -lt "$cap" ] && cap=$left
  timeout "$cap" python scripts/run_resumable.py Hopf:512 gpjax-grid 5e-7 nf_mul=10000 score=f32 >> "$LOG" 2>&1 && break
  echo "--- gp512 attempt $i failed (rc=$?)" >> "$LOG"
done

echo "=== handoff2: gp512 phase done, starting part B $(date +%H:%M:%S)" >> "$LOG"
exec bash scripts/chip_queue_r4b.sh
