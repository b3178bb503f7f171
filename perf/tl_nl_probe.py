"""Decompose TokenLearner and NonLocalBlock2D on the real chip.

Both sit ~10x off bandwidth roofline in the bf16 serving forward
(5.6 / 5.2 ms per 4096 windows, perf/profile_bf16.py) while their raw
work is tiny (TokenLearner: one (49x49)x(49x256) batched matmul + a
channel reduce; NonLocal: (49x9) attention at inter=128). This probe
times each internal stage to find the slow op.

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 900 python perf/tl_nl_probe.py
"""
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vct_jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, H, W, C, S = 4096, 7, 7, 256, 49
DT = jnp.bfloat16


def bench(fn, *args, n=20, label=""):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda t: float(jnp.sum(t.astype(jnp.float32))),
                           out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.tree_util.tree_map(lambda t: float(jnp.sum(t.astype(jnp.float32))),
                           out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:55s} {dt:7.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32), DT)
    w_conv = jnp.asarray(rng.rand(2, S).astype(np.float32), DT)
    scale = jnp.asarray(rng.rand(S).astype(np.float32))
    bias = jnp.asarray(rng.rand(S).astype(np.float32))
    print("devices:", jax.devices(), flush=True)

    # --- TokenLearner stages ---
    def tl_full(x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        avg = jnp.mean(x, axis=-1, keepdims=True)
        comb = jnp.concatenate([mx, avg], axis=-1)
        fmap = comb @ w_conv
        fmap = fmap.astype(jnp.float32) * scale + bias   # BN affine (eval)
        wgt = jax.nn.sigmoid(jax.nn.relu(fmap)).astype(DT)
        return jnp.einsum("bhwc,bhws->bsc", x, wgt) / (H * W)

    def tl_reduce(x):
        return jnp.max(x, axis=-1), jnp.mean(x, axis=-1)

    def tl_einsum(x):
        wgt = x[..., :S]                        # stand-in weight
        return jnp.einsum("bhwc,bhws->bsc", x, wgt)

    def tl_matmul(x):
        # same contraction as one flattened GEMM: (B, HW, C)^T x (B, HW, S)
        xf = x.reshape(B, H * W, C)
        wgt = xf[..., :S]
        return jnp.einsum("blc,bls->bsc", xf, wgt)

    bench(tl_full, x, label="TokenLearner full (eval-mode affine BN)")
    bench(tl_reduce, x, label="  channel max+mean reduce only")
    bench(tl_einsum, x, label="  bhwc,bhws->bsc einsum only")
    bench(tl_matmul, x, label="  same as flattened blc,bls->bsc")

    # --- NonLocal stages ---
    inter = 128
    wq = jnp.asarray(rng.rand(C, inter).astype(np.float32), DT)
    y = x
    z = x

    def nl_projs(x, y, z):
        return x.reshape(-1, C) @ wq, y.reshape(-1, C) @ wq, \
            z.reshape(-1, C) @ wq

    def nl_full_fused(x, y, z):
        from vit_cnn_tpu.ops.attention import fused_attention_auto
        tq = (x.reshape(-1, C) @ wq).reshape(B, H * W, inter)
        phi = (y.reshape(-1, C) @ wq).reshape(B, H, W, inter)
        gg = (z.reshape(-1, C) @ wq).reshape(B, H, W, inter)
        phi = jax.lax.reduce_window(phi, -jnp.inf, jax.lax.max,
                                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        gg = jax.lax.reduce_window(gg, -jnp.inf, jax.lax.max,
                                   (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        tk = phi.reshape(B, -1, inter)
        tv = gg.reshape(B, -1, inter)
        return fused_attention_auto(tq, tk, tv, 1.0)

    def nl_full_einsum(x, y, z):
        tq = (x.reshape(-1, C) @ wq).reshape(B, H * W, inter)
        phi = (y.reshape(-1, C) @ wq).reshape(B, H, W, inter)
        gg = (z.reshape(-1, C) @ wq).reshape(B, H, W, inter)
        phi = jax.lax.reduce_window(phi, -jnp.inf, jax.lax.max,
                                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        gg = jax.lax.reduce_window(gg, -jnp.inf, jax.lax.max,
                                   (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        tk = phi.reshape(B, -1, inter)
        tv = gg.reshape(B, -1, inter)
        s = jnp.einsum("bqi,bki->bqk", tq, tk).astype(jnp.float32)
        a = jax.nn.softmax(s, axis=-1).astype(DT)
        return jnp.einsum("bqk,bki->bqi", a, tv)

    bench(nl_projs, x, y, z, label="NonLocal theta/phi/g projections only")
    bench(nl_full_fused, x, y, z, label="NonLocal full w/ Pallas fused_attention")
    bench(nl_full_einsum, x, y, z, label="NonLocal full w/ plain einsum+softmax")


if __name__ == "__main__":
    main()
