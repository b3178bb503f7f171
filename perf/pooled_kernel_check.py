"""Attention-kernel hardware gates: compile + numerics + timing checks.

Two independently-gated kernel families, checked in risk order:

1. HEADS section (marker ``HEADS_CHECK_OK``): the masked-dots head-last
   kernel at the ViTBackbone tiny-dim_head routing shapes —
   (4096, 65, 4, 16) MHST en_transformer and (2048, 146, 4, 16)
   SpectralFormer/S2EFT. Hardware-verified already at (4096, 65, 16, 4)
   (perf/mhst_attn_variants.py, 6.0 ms); these shapes have only passed
   interpret mode. Gates ``VCT_HEADS_ATTN`` (nn/transformer.py).
2. POOLED section (marker ``POOLED_CHECK_OK``): the LN-fold pooled
   attention kernel (ops/attention.pooled_heads_attention — LN + 16-head
   attention + residual in one VMEM pass) vs the unfused reference at
   the MHST serving shape. Never compiled on hardware; this kernel
   family produced remote-compiler failures during development. Gates
   ``VCT_POOLED_ATTN``.

The heads section runs FIRST so a pooled Mosaic rejection cannot lose
its result; exit is 0 only if EVERYTHING passes (the harvest chain's
conservative gate), and the per-section markers let a log reader (or
perf/post_harvest_r4.sh) flip the two env-flag defaults independently.

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 1800 python perf/pooled_kernel_check.py
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
                                       fused_attention_heads,
                                       pooled_attention_reference,
                                       pooled_heads_attention)

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, N, H, HD = 4096, 65, 16, 4
C = H * HD
SCALE = HD ** -0.5


def bench(fn, *args, n=20, label=""):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print("%-40s %8.3f ms" % (label, (time.time() - t0) / n * 1e3),
          flush=True)
    return out


keys = jax.random.split(jax.random.PRNGKey(0), 9)

# ---- section 1: heads kernel at the ViTBackbone routing shapes ---------
for label, (bb, n, h, hd) in (("en_transformer", (4096, 65, 4, 16)),
                              ("spectralformer", (2048, 146, 4, 16))):
    qh, kh, vh = (jax.random.normal(keys[i], (bb, n, h, hd), jnp.bfloat16)
                  for i in range(3))
    r = bench(lambda a, b, c: attention_reference_heads(a, b, c, hd ** -.5),
              qh, kh, vh, label=f"{label} XLA einsum")
    g = bench(lambda a, b, c: fused_attention_heads(a, b, c, hd ** -.5),
              qh, kh, vh, label=f"{label} heads kernel")
    e = float(jnp.max(jnp.abs(g.astype(jnp.float32)
                              - r.astype(jnp.float32))))
    print(f"{label}: max|diff| = {e:.2e}")
    assert np.isfinite(e) and e < 0.1
print("HEADS_CHECK_OK", flush=True)

# ---- section 2: LN-fold pooled kernel at the MHST serving shape --------
q, k, v = (jax.random.normal(keys[i], (B, N, C), jnp.bfloat16)
           for i in range(3))
lns = [(1.0 + 0.1 * jax.random.normal(keys[3 + i], (HD,)),
        0.1 * jax.random.normal(keys[6 + i], (HD,))) for i in range(3)]

ref = bench(lambda a, b, c: pooled_attention_reference(
    a, b, c, lns[0], lns[1], lns[2], H, SCALE), q, k, v,
    label="unfused reference (XLA)")
got = bench(lambda a, b, c: pooled_heads_attention(
    a, b, c, lns[0][0], lns[0][1], lns[1][0], lns[1][1], lns[2][0],
    lns[2][1], H, SCALE), q, k, v, label="pooled kernel (Pallas)")
err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                            - ref.astype(jnp.float32))))
print(f"max|diff| = {err:.2e}")
assert np.isfinite(err) and err < 0.1, "pooled kernel numerics off"
print("POOLED_CHECK_OK", flush=True)
print("OK")
