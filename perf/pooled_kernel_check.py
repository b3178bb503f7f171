"""Pooled-attention kernel: real-TPU compile + numerics + timing check.

Validates ops/attention.pooled_heads_attention (LN + 16-head attention +
residual in one VMEM pass) against the unfused reference composition at
the MHST serving shape, then times both. Run FIRST after any kernel
edit — a Mosaic rejection here is cheaper to find than inside the full
MHST program.

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 1200 python perf/pooled_kernel_check.py
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

from vit_cnn_tpu.ops.attention import (pooled_attention_reference,  # noqa: E402
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

# the plain heads kernel also serves every tiny-dim_head ViTBackbone
# (nn/transformer.py routing): MHST en_transformer (65 tok) and
# SpectralFormer/S2EFT (146 tok), all 4 heads of 16
from vit_cnn_tpu.ops.attention import (attention_reference_heads,  # noqa: E402
                                       fused_attention_heads)

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
print("OK")
