#!/bin/bash
# Round-4 CPU seed-statistics chain (VERDICT r3 item 7):
#   1. Rossler eps=5e-9 nnGP-NM seeds 50-59  (PARITY band n=5 -> n=15)
#   2. Burgers across-m NM m=18 seeds 4-13   (band n=4 -> n=14)
# All runs force the CPU backend; artifacts append to the existing
# table2/across-m stores.
cd /root/repo
LOG=results/logs/cpu_seed_chain.log
echo "=== cpu seed chain start $(date)" >> "$LOG"
for s in 50 51 52 53 54 55 56 57 58 59; do
  TABLE2_CPU=1 TABLE2_ONLY=Rossler TABLE2_SEED=$s \
    timeout 1200 python scripts/table2_tpu.py 5e-9 f64 nngp-nm >> "$LOG" 2>&1
  echo "--- rossler seed $s rc=$? $(date +%H:%M:%S)" >> "$LOG"
done
ACROSSM_CPU=1 timeout 36000 python scripts/burgers_across_m_tpu.py 5.9 10 nm 18 4 >> "$LOG" 2>&1
echo "=== cpu seed chain done rc=$? $(date)" >> "$LOG"
