#!/bin/bash
# Post-harvest follow-up (round 4): runs AFTER perf/harvest_r4.sh prints
# "HARVEST DONE" to /tmp/harvest_r4.log. Separate watcher instead of
# editing the running chain script (bash reads scripts incrementally —
# editing a script mid-execution corrupts it).
#
# Steps, driven by the per-section markers pooled_kernel_check.py prints:
#   1. If HEADS_CHECK_OK and/or POOLED_CHECK_OK appear in the chain log,
#      re-run profile_mhst + bench_models MHST/SpectralFormer/S2EFT with
#      the corresponding gates (VCT_HEADS_ATTN / VCT_POOLED_ATTN) ON —
#      the chain itself runs them with conservative defaults, so these
#      rows are the kernels' first integrated hardware numbers.
#   2. perf/cold_decomp.py — VERDICT r3 #6: decompose the remaining
#      ~70 s of cold start into tunnel floor vs our code.
#   3. A final bench.py so the freshest flagship headline is in the log
#      even if no builder session is alive.
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/vct_jax_cache
log=/tmp/post_harvest_r4.log
chain=/tmp/harvest_r4.log
echo "post-harvest watcher start $(date)" > "$log"

for i in $(seq 1 720); do   # up to 12 h
  if grep -q "HARVEST DONE" "$chain" 2>/dev/null; then
    echo "harvest done detected $(date)" >> "$log"
    sleep 60   # let the chain's last process fully exit

    flags=""
    grep -q "HEADS_CHECK_OK" "$chain" && flags="VCT_HEADS_ATTN=1"
    grep -q "POOLED_CHECK_OK" "$chain" && flags="$flags VCT_POOLED_ATTN=1"
    echo "gate flags from markers: '$flags'" >> "$log"
    if [ -n "$flags" ]; then
      echo "=== profile_mhst (gates on) ===" >> "$log"
      env $flags timeout 2400 python -u perf/profile_mhst.py >> "$log" 2>&1
      echo "profile_mhst exit=$?" >> "$log"
      echo "=== bench_models gated rows ===" >> "$log"
      env $flags timeout 3600 python -u perf/bench_models.py \
        MHST SpectralFormer S2EFT >> "$log" 2>&1
      echo "bench_models exit=$?" >> "$log"
    fi

    echo "=== cold_decomp ===" >> "$log"
    timeout 1200 python -u perf/cold_decomp.py >> "$log" 2>&1
    echo "cold_decomp exit=$?" >> "$log"
    echo "=== final bench ===" >> "$log"
    timeout 2700 python -u bench.py >> "$log" 2>&1
    echo "bench exit=$?" >> "$log"
    echo "POST-HARVEST DONE $(date)" >> "$log"
    exit 0
  fi
  if ! kill -0 "$(cat /tmp/harvest_r4.pid 2>/dev/null)" 2>/dev/null; then
    echo "harvest chain died without DONE $(date)" >> "$log"
    exit 1
  fi
  sleep 60
done
echo "watcher timed out $(date)" >> "$log"
