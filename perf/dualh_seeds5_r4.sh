#!/bin/bash
# Round-4 second seed-band pass: 5-seed bands for the four noisiest /
# most-scrutinized dual-harness rows (VERDICT r3 weak #5), cheapest
# model first so a yield keeps the completed rows. Same TPU-priority
# protocol as dualh_seeds_r4.sh: before each model — and every 60 s
# during one — check for the harvest chain's "TPU BACK" marker and stop
# (killing the current run by saved PID, never by pattern).
cd /root/repo || exit 1
log=/tmp/dualh5_r4.log
chain=/tmp/harvest_r4.log
echo "5-seed band pass start $(date)" > "$log"
for m in Cross_fusion_CNN HCTnet Multimodality_Mamba FusAtNet; do
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
echo "5-seed band pass DONE $(date)" >> "$log"
