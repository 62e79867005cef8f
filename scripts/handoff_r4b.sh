#!/bin/bash
# Mid-round handoff: supervise the in-flight gp512 resumable run (started
# by chip_queue_r4.sh part A, which has been stopped), retry it to
# convergence if needed, then launch the reordered part-B queue
# (chip_queue_r4b.sh) with the round-end deadline guard so the driver's
# final bench gets the chip uncontended.
cd /root/repo
LOG=results/logs/chipqueue.log
GP_PID=${1:?pid of in-flight gp512 python}
DEADLINE=${QUEUE_DEADLINE:?epoch deadline required}
# gp512 gets the chip only until this sub-deadline; after it, part B's
# items (nnGP-time C15, 5e-9 router, small-N rows) take priority and
# gp512's checkpoints carry the remaining iterations to a later session.
GP_DEADLINE=${GP512_DEADLINE:-$DEADLINE}

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

echo "=== handoff: waiting on in-flight gp512 (pid $GP_PID, sub-deadline $(date -d @$GP_DEADLINE +%H:%M)) $(date +%H:%M:%S)" >> "$LOG"
while kill -0 "$GP_PID" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$GP_DEADLINE" ]; then
    echo "=== handoff: gp512 sub-deadline, stopping in-flight attempt $(date +%H:%M:%S)" >> "$LOG"
    kill "$GP_PID" 2>/dev/null
    sleep 30
    kill -9 "$GP_PID" 2>/dev/null
    break
  fi
  sleep 60
done

for i in 4 5 6 7; do
  converged && break
  [ "$(date +%s)" -ge "$GP_DEADLINE" ] && { echo "handoff: gp512 sub-deadline reached, parking remaining iters in ckpt" >> "$LOG"; break; }
  probe
  echo "=== gp512 attempt $i (handoff) $(date +%H:%M:%S)" >> "$LOG"
  left=$((GP_DEADLINE - $(date +%s))); cap=7200; [ "$left" -lt "$cap" ] && cap=$left
  timeout "$cap" python scripts/run_resumable.py Hopf:512 gpjax-grid 5e-7 nf_mul=10000 score=f32 >> "$LOG" 2>&1 && break
  echo "--- gp512 attempt $i failed (rc=$?)" >> "$LOG"
done

echo "=== handoff: gp512 phase done, starting part B $(date +%H:%M:%S)" >> "$LOG"
QUEUE_DEADLINE="$DEADLINE" exec bash scripts/chip_queue_r4b.sh
