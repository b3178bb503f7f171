"""MHST pooled-attention kernel sweep (VERDICT r2 weak #3 follow-up).

perf/profile_mhst.py pinned the outlier: attention is 228 ms of the
250 ms MHST bf16 forward (8 blocks x 28.5 ms) at (B=4096, 16 heads,
65 tokens, hd=4). This probe times the XLA einsum path vs the
fused_attention_heads Pallas kernel over block_g, and checks numerics.

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 900 python perf/mhst_attn_sweep.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vct_jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vit_cnn_tpu.ops.attention import (attention_reference_heads,  # noqa: E402
                                       fused_attention_heads)

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, N, H, HD = 4096, 65, 16, 4
DT = jnp.bfloat16
SCALE = HD ** -0.5


def bench(fn, *args, n=20, label=""):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    ms = (time.time() - t0) / n * 1e3
    print("%-44s %8.3f ms" % (label, ms), flush=True)
    return ms, out


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, N, H, HD), DT)
    k = jax.random.normal(kk, (B, N, H, HD), DT)
    v = jax.random.normal(kv, (B, N, H, HD), DT)

    _, ref = bench(lambda a, b, c: attention_reference_heads(a, b, c, SCALE),
                   q, k, v, label="XLA einsum (current MHST path)")
    for bg in (32, 64, 128, 256):
        try:
            ms, out = bench(
                lambda a, b, c, bg=bg: fused_attention_heads(a, b, c,
                                                             SCALE, bg),
                q, k, v, label=f"pallas heads kernel block_g={bg}")
        except Exception as e:
            print(f"block_g={bg}: FAILED {str(e)[:200]}", flush=True)
            continue
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"   max|diff| vs XLA = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
