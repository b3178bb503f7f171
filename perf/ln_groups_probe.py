"""Hardware perf gate for VCT_LN_GROUPS_MM (round 5): reshape-free
matmul-stat hd-group LayerNorm vs ln_groups_reference's lane-splitting
reshape, at the MHST pooled-attention serving shape (B=4096, 65 tokens,
c=64, 16 groups of 4, bf16), standalone and in the _PoolAttention middle
path. Prints LN_MM_CHECK_OK when the matmul form is both numerically
sane on the chip (<=5e-2 vs reference, bf16) and faster in context.

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 1200 python perf/ln_groups_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vit_cnn_tpu.ops.attention import (ln_groups_matmul,  # noqa: E402
                                       ln_groups_reference,
                                       pooled_heads_attention_auto)

B, N, C, HD = 4096, 65, 64, 4


def bench(f, *args, n=16, label=""):
    g = jax.jit(f)
    out = g(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _i in range(n):
        out = g(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    ms = (time.time() - t0) / n * 1e3
    print("%-48s %8.3f ms" % (label, ms), flush=True)
    return ms, out


key = jax.random.PRNGKey(0)
x = (jax.random.normal(key, (B, N, C)) * 1.7 + 0.8).astype(jnp.bfloat16)
gamma = jax.random.normal(jax.random.PRNGKey(1), (HD,))
beta = jax.random.normal(jax.random.PRNGKey(2), (HD,))

t_ref, o_ref = bench(lambda a: ln_groups_reference(a, gamma, beta, HD), x,
                     label="ln_groups_reference (reshape)")
t_mm, o_mm = bench(lambda a: ln_groups_matmul(a, gamma, beta, HD), x,
                   label="ln_groups_matmul (block-diag MXU)")
diff = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32)
                             - o_mm.astype(jnp.float32))))
print(f"standalone max|diff| = {diff:.2e}", flush=True)

# in-context: the full middle path (3 LNs + heads kernel) A/B
q = (jax.random.normal(jax.random.PRNGKey(3), (B, N, C)) * 0.9
     ).astype(jnp.bfloat16)
k = (jax.random.normal(jax.random.PRNGKey(4), (B, N, C)) * 0.9
     ).astype(jnp.bfloat16)
v = (jax.random.normal(jax.random.PRNGKey(5), (B, N, C)) * 0.9
     ).astype(jnp.bfloat16)
lns = [(jax.random.normal(jax.random.PRNGKey(10 + i), (HD,)),
        jax.random.normal(jax.random.PRNGKey(20 + i), (HD,)))
       for i in range(3)]


def middle(a, b_, c_):
    return pooled_heads_attention_auto(a, b_, c_, lns[0], lns[1], lns[2],
                                       16, HD ** -0.5)


# NOTE: jax.jit(f) on the SAME function object reuses the trace cache, so
# flipping the env gate between two jax.jit(middle) calls silently reruns
# the first executable — wrap in distinct lambdas to force a re-trace.
os.environ["VCT_LN_GROUPS_MM"] = "0"
t_ctx_ref, o_ctx_ref = bench(lambda a, b_, c_: middle(a, b_, c_), q, k, v,
                             label="middle path, reference LNs")
os.environ["VCT_LN_GROUPS_MM"] = "1"
t_ctx_mm, o_ctx_mm = bench(lambda a, b_, c_: middle(a, b_, c_), q, k, v,
                           label="middle path, matmul LNs")
cdiff = float(jnp.max(jnp.abs(o_ctx_ref.astype(jnp.float32)
                              - o_ctx_mm.astype(jnp.float32))))
print(f"in-context max|diff| = {cdiff:.2e}", flush=True)

ok = diff <= 5e-2 and cdiff <= 5e-2 and t_ctx_mm < t_ctx_ref
print(("LN_MM_CHECK_OK" if ok else "LN_MM_CHECK_FAIL")
      + f" standalone {t_ref:.3f}->{t_mm:.3f} ms, "
      f"in-context {t_ctx_ref:.3f}->{t_ctx_mm:.3f} ms", flush=True)
sys.exit(0 if ok else 1)
