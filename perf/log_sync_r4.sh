#!/bin/bash
# Mirrors the round-4 detached-chain logs from /tmp into the repo every
# 5 min so the driver's end-of-round commit preserves the measurement
# evidence even if no builder session is alive when the chain finishes.
# (No git operations here — the round driver commits uncommitted work.)
cd /root/repo || exit 1
mkdir -p perf/logs
for i in $(seq 1 300); do   # ~25 h
  for f in harvest_r4 post_harvest_r4; do
    if [ -f /tmp/$f.log ]; then
      # drop the enormous repeated xla_bridge/AOT warnings; keep substance
      grep -v -e "xla_bridge:905" -e "cpu_aot_loader.cc" /tmp/$f.log \
        > perf/logs/$f.log.tmp && mv perf/logs/$f.log.tmp perf/logs/$f.log
    fi
  done
  sleep 300
done
