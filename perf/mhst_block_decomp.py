"""Decompose _PoolAttention's NON-attention cost (profile_mhst.py: one
module = 28.5 ms, the attention einsum core alone = 8.9 ms; where do the
other ~19.6 ms go?). Times each stage in isolation at the serving shape
(B=4096, n=65, c=64, 16 heads, hd=4), bf16.

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 1500 python perf/mhst_block_decomp.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vct_jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, N, H, HD = 4096, 65, 16, 4
C = H * HD
HH = WW = 8
DT = jnp.bfloat16


def bench(fn, *args, n=20, label=""):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ms = (time.time() - t0) / n * 1e3
    print("%-48s %8.3f ms" % (label, ms), flush=True)
    return ms


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, N, C), DT)
w = jax.random.normal(key, (C, C), DT)
kern = jax.random.normal(key, (3, 3, 1, C), DT)
gamma = jnp.ones((HD,), DT)
beta = jnp.zeros((HD,), DT)

bench(lambda a: a @ w, x, label="one Dense 64x64 (x3 qkv + proj in block)")


def pool_conv(t):
    cls_tok, rest = t[:, :1], t[:, 1:]
    r = jax.lax.conv_general_dilated(
        rest.reshape(B, HH, WW, C), kern, (1, 1), [(1, 1), (1, 1)],
        feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.concatenate([cls_tok, r.reshape(B, HH * WW, C)], axis=1)


bench(pool_conv, x, label="one depthwise pool conv (x3)")


def ln_hd(t):
    t4 = t.reshape(B, N, H, HD)
    mu = jnp.mean(t4, -1, keepdims=True)
    var = jnp.mean(jnp.square(t4), -1, keepdims=True) - jnp.square(mu)
    y = (t4 - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    return y.reshape(B, N, C)


bench(ln_hd, x, label="one LayerNorm over hd=4 (x3)")
bench(lambda a: pool_conv(ln_hd(a)), x, label="pool conv + LN fused pair")


def residual(o, q):
    return o.at[:, 1:].add(q[:, 1:])


bench(residual, x, x, label="residual .at[:,1:].add")


def full_nonattn(t):
    q = ln_hd(pool_conv(t @ w))
    k = ln_hd(pool_conv(t @ w))
    v = ln_hd(pool_conv(t @ w))
    o = residual(v, q)       # stand-in for attention output
    return o @ w


bench(full_nonattn, x, label="qkv dense + 3 pools + 3 LN + resid + proj")
