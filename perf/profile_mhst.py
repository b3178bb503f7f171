"""MHST serving decomposition (VERDICT r2 weak #3: 12.4k patches/s/chip,
3.5x slower than the flagship; where does it go?). bf16, B=4096, fenced
on host transfers.

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 1800 python perf/profile_mhst.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vit_cnn_tpu.models.mhst import (MHST, _HSIEncoder,  # noqa: E402
                                     _LiDAREncoder, _PoolAttention,
                                     _StepPoolBlock)
from vit_cnn_tpu.nn.precision import bf16_apply  # noqa: E402
from vit_cnn_tpu.nn.transformer import ViTBackbone  # noqa: E402


def bench(fn, *args, n=8, label=""):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _i in range(n):
        out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ms = (time.time() - t0) / n * 1e3
    print("%-52s %8.2f ms" % (label, ms), flush=True)
    return ms


B, P, BANDS, CLASSES = 4096, 8, 144, 15
key = jax.random.PRNGKey(0)

hsi = jax.random.normal(key, (B, P, P, BANDS))
lidar = jax.random.normal(key, (B, P, P, 1))

m = MHST(n_bands1=BANDS, n_bands2=1, patch_size=P, num_patches=P * P,
         n_classes=CLASSES)
v = jax.jit(m.init, static_argnames=("train",))(
    {"params": key, "dropout": key}, hsi[:2], lidar[:2], train=False)
mb = bf16_apply(m.apply)
full = bench(lambda a, b: mb(v, a, b, train=False), hsi, lidar,
             label=f"full MHST fwd bf16 (B={B})")

enc = _HSIEncoder()
ve = jax.jit(enc.init, static_argnames=("train",))(key, hsi[:2], train=False)
eb = bf16_apply(enc.apply)
bench(lambda a: eb(ve, a, train=False), hsi, label="HSI encoder")

lenc = _LiDAREncoder()
vl = jax.jit(lenc.init, static_argnames=("train",))(key, lidar[:2],
                                                    train=False)
lb = bf16_apply(lenc.apply)
bench(lambda a: lb(vl, a, train=False), lidar, label="LiDAR encoder")

dim = 64
tok = jax.random.normal(key, (B, P * P + 1, dim))
vit = ViTBackbone(dim, 5, 4, 16, 8, 0.1)
vv = jax.jit(vit.init, static_argnames=("train",))(
    {"params": key, "dropout": key}, tok[:2], train=False)
vb = bf16_apply(vit.apply)
bench(lambda a: vb(vv, a, train=False), tok,
      label="en_transformer (ViT depth 5, 65 tok)")

blk = _StepPoolBlock(dim, 16, (P, P), True, 5.0, True, 4.0, 0.1, 0.1)
vb1 = jax.jit(blk.init, static_argnames=("train",))(
    {"params": key, "dropout": key}, tok[:2], train=False)
bb = bf16_apply(blk.apply)
one = bench(lambda a: bb(vb1, a, train=False), tok,
            label="ONE StepPoolBlock (x8 in model)")

att = _PoolAttention(dim, 16, (P, P), True, 0.1, 0.1)
va = jax.jit(att.init, static_argnames=("train",))(
    {"params": key, "dropout": key}, tok[:2], train=False)
ab = bf16_apply(att.apply)
attn_ms = bench(lambda a: ab(va, a, train=False), tok,
                label="ONE _PoolAttention (16 heads, hd=4)")
print(f"-> 8 blocks ~= {8 * one:.1f} ms of {full:.1f}; attention alone "
      f"{8 * attn_ms:.1f}", flush=True)
