#!/bin/bash
# On-chip gpjax-grid Table-2 column: run each system through the
# crash-resumable wrapper until it converges (fresh process per attempt —
# the axon toolchain sporadically kernel-faults long multi-executable
# processes; per-iteration checkpoints make the run completable anyway).
cd /root/repo
for sysname in "$@"; do
  for attempt in 1 2 3 4 5 6; do
    echo "=== $sysname gpjax-grid attempt $attempt $(date +%H:%M:%S) ==="
    timeout 3600 python scripts/run_resumable.py "$sysname" gpjax-grid 5e-7 \
      && break
    echo "--- attempt $attempt failed (rc=$?) ---"
    sleep 60
  done
done
echo "=== gpgrid_tpu_loop done $(date +%H:%M:%S) ==="
