"""Bisect the gap between the real MHST _StepPoolBlock (~16.8 ms + ~2 ms
dispatch) and the lean staged form (~10.3 ms) at the serving shape
(B=4096, n=65, c=64, 16 heads, bf16). Adds the omitted pieces one at a
time with params transplanted from a real module; the full staging must
match the module bit-for-bit-ish.

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 2400 python perf/mhst_block_gap.py
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

from vit_cnn_tpu.models.mhst import _StepPoolBlock  # noqa: E402
from vit_cnn_tpu.nn.precision import bf16_apply, cast_floating  # noqa: E402
from vit_cnn_tpu.ops.attention import (fused_attention_heads,  # noqa: E402
                                       ln_groups_reference)

B, N, H, HD = 4096, 65, 16, 4
C = H * HD
P = 8

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, N, C), jnp.bfloat16)

blk = _StepPoolBlock(C, H, (P, P), True, 5.0, True, 4.0, 0.1, 0.1)
v = jax.jit(blk.init, static_argnames=("train",))(
    {"params": key, "dropout": key}, x[:2], train=False)
pb = cast_floating(v["params"], jnp.bfloat16)
apply_bf16 = bf16_apply(blk.apply)


def bench(fn, label, n=20):
    f = jax.jit(lambda a: fn(a))
    out = f(x)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = f(x)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    ms = (time.time() - t0) / n * 1e3
    print("%-52s %8.3f ms" % (label, ms), flush=True)
    return ms


def ln_full(t, sc, bi):
    tf = t.astype(jnp.float32)
    mu = jnp.mean(tf, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(tf * tf, -1, keepdims=True) - mu * mu, 0.0)
    y = (tf - mu) * jax.lax.rsqrt(var + 1e-5)
    return (y * sc.astype(jnp.float32) + bi.astype(jnp.float32)
            ).astype(t.dtype)


def staged(level, _p=pb):
    att = _p["attn"]

    def pool(t, name):
        cls_tok, rest = t[:, :1], t[:, 1:]
        kern = jnp.tile(att[name]["kernel"], (1, 1, 1, H))
        r = jax.lax.conv_general_dilated(
            rest.reshape(B, P, P, C), kern.astype(t.dtype), (1, 1),
            [(1, 1), (1, 1)], feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        t2 = jnp.concatenate([cls_tok, r.reshape(B, P * P, C)], axis=1)
        ln = att[name + "_norm"]
        return t2, (ln["scale"], ln["bias"])

    def f(t):
        width = None
        if level >= 2:
            logits = (t[:, 0] @ _p["head_select"]["kernel"]
                      + _p["head_select"]["bias"])
            sel = (jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5
                   ).astype(t.dtype)                      # eval gumbel
            width = jnp.repeat(sel, HD, axis=-1)[:, None, :]
        z = ln_full(t, _p["norm1"]["scale"], _p["norm1"]["bias"])
        qkv = {}
        for nm in ("query", "key", "value"):
            y = z @ att[nm]["kernel"]
            if level >= 1:
                y = y + att[nm]["bias"]
            # level 3: drop the redundant q/k/v masks — per-head isolation
            # (depthwise pools, hd-group LNs, per-head attention) makes
            # the o*width mask below zero the same lanes exactly
            if width is not None and level < 3:
                y = y * width
            qkv[nm] = y
        q, lnq = pool(qkv["query"], "pool_q")
        k, lnk = pool(qkv["key"], "pool_k")
        vv, lnv = pool(qkv["value"], "pool_v")
        hv = lambda a, ln: ln_groups_reference(a, ln[0], ln[1], HD
                                               ).reshape(B, N, H, HD)
        o = fused_attention_heads(hv(q, lnq), hv(k, lnk), hv(vv, lnv),
                                  HD ** -0.5, residual=True
                                  ).reshape(B, N, C)
        if width is not None:
            o = o * width
        o = o @ att["proj"]["kernel"]
        if level >= 1:
            o = o + att["proj"]["bias"]
        t = t + o
        z2 = ln_full(t, _p["norm2"]["scale"], _p["norm2"]["bias"])
        if width is not None:
            z2 = z2 * width
        h1 = z2 @ _p["fc1"]["kernel"]
        if level >= 1:
            h1 = h1 + _p["fc1"]["bias"]
        h1 = jax.nn.gelu(h1)
        h2 = h1 @ _p["fc2"]["kernel"]
        if level >= 1:
            h2 = h2 + _p["fc2"]["bias"]
        return t + h2
    return f


t_mod = bench(lambda a: apply_bf16(v, a, train=False), "real module")
t0 = bench(staged(0), "staged lean (no bias, no head-select)")
t1 = bench(staged(1), "staged + biases + LN affine")
t2 = bench(staged(2), "staged + head-select width masks (full)")
t3 = bench(staged(3), "staged, o/fc1 masks only (optimized)")
want = jax.jit(lambda a: apply_bf16(v, a, train=False))(x)
for lvl in (2, 3):
    got = jax.jit(staged(lvl))(x)
    diff = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                 - want.astype(jnp.float32))))
    print(f"staged(level {lvl})-vs-module max|diff| = {diff:.2e}")
print(f"gap: module {t_mod:.2f} vs full staging {t2:.2f} "
      f"(biases {t1 - t0:+.2f}, head-select {t2 - t1:+.2f}, "
      f"optimized saves {t2 - t3:+.2f})", flush=True)
