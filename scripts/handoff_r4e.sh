#!/bin/bash
# Round-4 supervisor, take 3: after part B's nngp-time Lorenz attempts
# (queue_deadline pulled to 14:20 so smalln/t2 don't start), the chip
# goes to the FIXED gp512 resume — models/gp.py now validates the
# posterior solve (residual check + candidate walk + jitter escalation),
# closing the silent bare-Parareal degeneration that stalled iters
# 20-30. Attempts until 15:05, then the 5e-9 router validation partial
# (per-system dumps) until 15:25; chip free well before the round-end
# driver bench.
cd /root/repo
LOG=results/logs/chipqueue.log
PARTB_PID=${1:?pid of the exec'd part B shell}
GP_DEADLINE=$(date -d "today 15:05" +%s)
T2_DEADLINE=$(date -d "today 15:25" +%s)

while kill -0 "$PARTB_PID" 2>/dev/null; do sleep 30; done
echo "=== handoff3: part B exited; gp512 FIXED resume phase $(date +%H:%M:%S)" >> "$LOG"

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

converged() {
  python - <<'PYEOF'
import json, sys
rows = json.load(open('results/resumable_runs.json'))
ok = any(r.get('system') == 'Hopf' and r.get('N') == 512
         and r.get('model') == 'gpjax-grid' and r.get('converged')
         for r in rows)
sys.exit(0 if ok else 1)
PYEOF
}

for i in 1 2 3 4; do
  converged && break
  left=$((GP_DEADLINE - $(date +%s)))
  [ "$left" -le 120 ] && { echo "handoff3: gp512 window over, parking in ckpt $(date +%H:%M:%S)" >> "$LOG"; break; }
  probe
  echo "=== gp512-fixed attempt $i (cap ${left}s) $(date +%H:%M:%S)" >> "$LOG"
  timeout "$left" python scripts/run_resumable.py Hopf:512 gpjax-grid 5e-7 nf_mul=10000 score=f32 >> "$LOG" 2>&1 && break
  echo "--- gp512-fixed attempt $i ended (rc=$?)" >> "$LOG"
done

left=$((T2_DEADLINE - $(date +%s)))
if [ "$left" -gt 300 ]; then
  probe
  echo "=== t2_5e9_router partial (cap ${left}s) $(date +%H:%M:%S)" >> "$LOG"
  timeout "$left" python scripts/table2_tpu.py 5e-9 ds nngp-grid >> "$LOG" 2>&1
  echo "=== t2_5e9_router rc=$? end $(date +%H:%M:%S)" >> "$LOG"
fi
echo "=== handoff3 done, chip free $(date +%H:%M:%S)" >> "$LOG"
