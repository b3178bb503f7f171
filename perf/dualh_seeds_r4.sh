#!/bin/bash
# Round-4 dual-harness seed-band expansion (VERDICT r3 weak #5): upgrade
# every substantive single-seed row to a 3-seed band on BOTH sides,
# cheapest models first. The TPU harvest chain (perf/harvest_r4.sh) has
# absolute priority on this 1-CPU host: before each model — and every
# 60 s during one — this wrapper checks for the chain's "TPU BACK"
# marker and stops (killing its own current run by saved PID, never by
# pattern). DUAL_HARNESS.md persists per completed model, so a kill
# loses at most the in-flight model's partial seeds.
cd /root/repo || exit 1
log=/tmp/dualh_r4.log
chain=/tmp/harvest_r4.log
echo "seed-band expansion start $(date)" > "$log"
for m in Early_fusion_CNN Middle_fusion_CNN Late_fusion_CNN S2ENet MFT \
         Multimodality_Mamba FusAtNet; do
  if grep -q "TPU BACK" "$chain" 2>/dev/null; then
    echo "TPU back — yielding before $m $(date)" >> "$log"; exit 0
  fi
  echo "--- $m $(date)" >> "$log"
  nice -n 19 python -u perf/dual_harness.py "$m" >> "$log" 2>&1 &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    if grep -q "TPU BACK" "$chain" 2>/dev/null; then
      kill "$pid" 2>/dev/null; wait "$pid" 2>/dev/null
      echo "TPU back — killed $m mid-run $(date)" >> "$log"; exit 0
    fi
    sleep 60
  done
  wait "$pid"
done
echo "seed-band expansion DONE $(date)" >> "$log"
