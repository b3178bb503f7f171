#!/bin/bash
# Round-5 harvest chain: run every hardware measurement the round needs,
# serially, with LOUD per-step exit markers (VERDICT r4 #4: the r4
# watchers under-delivered silently — this chain records every step's
# exit code and ends with an unambiguous DONE/FAILED line).
#
# Usage:  bash perf/harvest_r5.sh [logfile]
# Steps (each `timeout`-bounded; one TPU process at a time):
#   1 bench.py              headline (median-of-3 + stamp + MFU)
#   2 profile_mhst          MHST decomposition under today's default path
#   3 bench_models MHST SpectralFormer S2EFT    stale-row refresh
#   4 profile_train A/B     VCT_DIRSTREAM_FUSED_BWD=0 vs =1 (decisive
#                           in-step backward experiment)
#   5 cold_decomp           cold-start phase attribution
#   6 bench_models (rest)   full 14-row table refresh
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/harvest_r5.log}"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/vct_jax_cache"
FAILED=0

say() { echo "[harvest_r5 $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

step() {
  local name="$1"; shift
  say "STEP $name START: $*"
  "$@" >> "$LOG" 2>&1
  local rc=$?
  say "STEP $name exit=$rc"
  if [ $rc -ne 0 ]; then FAILED=$((FAILED + 1)); fi
  # mirror the log into the repo so end-of-round commits keep evidence
  cp "$LOG" perf/logs/harvest_r5.log 2>/dev/null || true
  return $rc
}

say "chain start (pid $$)"
step bench          timeout 2400 python bench.py
step profile_mhst   timeout 2400 python perf/profile_mhst.py
step bench_models_stale timeout 3000 python perf/bench_models.py \
  MHST SpectralFormer S2EFT
step train_ab_xla   timeout 2400 env VCT_DIRSTREAM_FUSED_BWD=0 \
  python perf/profile_train.py
step train_ab_fused timeout 2400 env VCT_DIRSTREAM_FUSED_BWD=1 \
  python perf/profile_train.py
step cold_decomp    timeout 2400 python perf/cold_decomp.py
step bench_models_rest timeout 5400 python perf/bench_models.py \
  EndNet Early_fusion_CNN Middle_fusion_CNN Late_fusion_CNN \
  Cross_fusion_CNN S2ENet FusAtNet MFT HCTnet GLT_Net Multimodality_Mamba

if [ $FAILED -eq 0 ]; then
  say "HARVEST r5 DONE: all steps green"
else
  say "HARVEST r5 FAILED: $FAILED step(s) nonzero — read $LOG"
fi
cp "$LOG" perf/logs/harvest_r5.log 2>/dev/null || true
exit $FAILED
