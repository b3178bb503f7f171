"""Compositional phase deltas for ONE MHST _StepPoolBlock at the serving
shape (B=4096, n=65, c=64, 16 heads, hd=4, bf16). Each program k extends
program k-1 by one phase; the DELTA is that phase's true in-context cost
(per-dispatch overhead cancels — the standalone micro-timings in
mhst_block_decomp.py are all ~2 ms regardless of work, i.e. dominated by
a fixed per-executable-call cost on this tunneled backend).

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 1800 python perf/mhst_block_phases.py
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

from vit_cnn_tpu.ops.attention import (fused_attention_heads,  # noqa: E402
                                       ln_groups_reference)

B, N, H, HD = 4096, 65, 16, 4
C = H * HD
HH = WW = 8
DT = jnp.bfloat16

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, N, C), DT)
wq = jax.random.normal(jax.random.PRNGKey(1), (C, C), DT) * 0.05
wk = jax.random.normal(jax.random.PRNGKey(2), (C, C), DT) * 0.05
wv = jax.random.normal(jax.random.PRNGKey(3), (C, C), DT) * 0.05
wp = jax.random.normal(jax.random.PRNGKey(4), (C, C), DT) * 0.05
w1 = jax.random.normal(jax.random.PRNGKey(5), (C, 4 * C), DT) * 0.05
w2 = jax.random.normal(jax.random.PRNGKey(6), (4 * C, C), DT) * 0.05
kq = jax.random.normal(jax.random.PRNGKey(7), (3, 3, 1, C), DT) * 0.2
gamma = jnp.ones((HD,), jnp.float32)
beta = jnp.zeros((HD,), jnp.float32)


def ln_full(t):
    tf = t.astype(jnp.float32)
    mu = jnp.mean(tf, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(tf * tf, -1, keepdims=True) - mu * mu, 0.0)
    return ((tf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(t.dtype)


def pool(t):
    cls_tok, rest = t[:, :1], t[:, 1:]
    r = jax.lax.conv_general_dilated(
        rest.reshape(B, HH, WW, C), kq, (1, 1), [(1, 1), (1, 1)],
        feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.concatenate([cls_tok, r.reshape(B, HH * WW, C)], axis=1)


def stage(upto):
    def f(t):
        z = ln_full(t)                                         # norm1
        q, k, v = z @ wq, z @ wk, z @ wv
        if upto == "qkv":
            return q + k + v
        q, k, v = pool(q), pool(k), pool(v)
        if upto == "pools":
            return q + k + v
        hv = lambda a: ln_groups_reference(a, gamma, beta, HD).reshape(
            B, N, H, HD)
        q, k, v = hv(q), hv(k), hv(v)
        if upto == "lns":
            return (q + k + v).reshape(B, N, C)
        o = fused_attention_heads(q, k, v, HD ** -0.5,
                                  residual=True).reshape(B, N, C)
        if upto == "attn":
            return o
        o = o @ wp
        y = t + o
        if upto == "proj":
            return y
        z2 = ln_full(y)
        y = y + jax.nn.gelu(z2 @ w1) @ w2
        return y
    return f


def bench(fn, label, n=24):
    f = jax.jit(fn)
    out = f(x)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = f(x)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    ms = (time.time() - t0) / n * 1e3
    print("%-40s %8.3f ms" % (label, ms), flush=True)
    return ms


ts = {}
prev = 0.0
for name in ("qkv", "pools", "lns", "attn", "proj", "full"):
    ts[name] = bench(stage(name), f"upto {name}")
print("\nphase deltas (in-context cost of each phase):")
order = [("ln1+qkv dense", "qkv", None), ("3 depthwise pools", "pools", "qkv"),
         ("3 hd-group LNs", "lns", "pools"), ("heads kernel", "attn", "lns"),
         ("proj+residual", "proj", "attn"), ("ln2+MLP", "full", "proj")]
for label, k, pk in order:
    d = ts[k] - (ts[pk] if pk else 0.0)
    print("  %-22s %7.3f ms" % (label, d))
