#!/bin/bash
# Round-4 TPU harvest chain (VERDICT r3 next-round #1).
#
# Probes the tunneled TPU until it answers, then runs the blocked
# verification chain SERIALLY (one TPU process at a time — two wedge the
# shared remote-compile service). Ordering is deliberate:
#   1. bench.py FIRST — the round's headline artifact, uses only
#      hardware-verified default paths; if the tunnel dies again we still
#      have the driver-contract number captured.
#   2. pooled_kernel_check / dirstream_bwd_check — the two gates for the
#      OFF-by-default round-3 kernels. A Mosaic rejection here can wedge
#      the tunnel, which is why they run AFTER bench.py.
#   3. profile_mhst with VCT_POOLED_ATTN=1 only if its gate passed.
#   4. profile_train fused-adjoint A/B only if its gate passed.
#   5. bench_models rows moved by round-3 routing changes.
# Decisions (flipping kernel defaults, refreshing ROOFLINE/tables) are
# made by the builder from /tmp/harvest_r4.log afterwards.
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/vct_jax_cache
log=/tmp/harvest_r4.log
step() { echo "=== STEP $1 $(date) ===" >> "$log"; }

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
jax.devices()
print(float(jnp.sum(jnp.ones((8,8)))))" >> "$log" 2>&1
}

echo "harvest watch start $(date)" > "$log"
ok=1
for i in $(seq 1 200); do
  if probe; then ok=0; echo "TPU BACK at $(date) (probe $i)" >> "$log"; break; fi
  echo "probe $i failed $(date)" >> "$log"
  sleep 240
done
[ $ok -ne 0 ] && { echo "gave up $(date)" >> "$log"; exit 1; }

# re-probe between steps; give the tunnel recovery time if a step wedged it
reprobe() {
  for j in 1 2 3 4; do
    probe && return 0
    echo "re-probe $j failed $(date); sleeping 600" >> "$log"
    sleep 600
  done
  return 1
}

step "bench.py"
timeout 2700 python -u bench.py >> "$log" 2>&1
echo "bench exit=$?" >> "$log"

step "pooled_kernel_check"
reprobe && timeout 1800 python -u perf/pooled_kernel_check.py >> "$log" 2>&1
pooled=$?
echo "pooled_check exit=$pooled" >> "$log"

step "dirstream_bwd_check"
reprobe && timeout 1800 python -u perf/dirstream_bwd_check.py >> "$log" 2>&1
dirs=$?
echo "dirstream_bwd_check exit=$dirs" >> "$log"

step "profile_mhst (pooled gate exit=$pooled)"
if [ "$pooled" -eq 0 ]; then
  reprobe && VCT_POOLED_ATTN=1 timeout 2400 python -u perf/profile_mhst.py >> "$log" 2>&1
else
  reprobe && timeout 2400 python -u perf/profile_mhst.py >> "$log" 2>&1
fi
echo "profile_mhst exit=$?" >> "$log"

if [ "$dirs" -eq 0 ]; then
  step "profile_train fused bwd"
  reprobe && VCT_DIRSTREAM_FUSED_BWD=1 timeout 2400 python -u perf/profile_train.py >> "$log" 2>&1
  echo "profile_train(fused) exit=$?" >> "$log"
fi
step "profile_train xla bwd"
reprobe && VCT_DIRSTREAM_FUSED_BWD=0 timeout 2400 python -u perf/profile_train.py >> "$log" 2>&1
echo "profile_train(xla) exit=$?" >> "$log"

step "bench_models MHST SpectralFormer S2EFT (pooled gate exit=$pooled)"
penv=""
[ "$pooled" -eq 0 ] && penv="VCT_POOLED_ATTN=1"
reprobe && env $penv timeout 3600 python -u perf/bench_models.py MHST SpectralFormer S2EFT >> "$log" 2>&1
echo "bench_models exit=$?" >> "$log"

echo "HARVEST DONE $(date)" >> "$log"
