"""bf16 (serving-config) decomposition of the flagship forward after the
round-2 kernel work (lane-major scan, one-hot permutes, anti-causal conv).
Fences on host transfers. Usage:
  JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache python perf/profile_bf16.py
"""
import os, sys, time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vit_cnn_tpu.nn.precision import bf16_apply  # noqa: E402


def bench(fn, *args, n=8, label=""):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.time()
    for _i in range(n):
        out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print("%-44s %8.2f ms" % (label, (time.time() - t0) / n * 1e3),
          flush=True)


B = 4096
key = jax.random.PRNGKey(0)

from vit_cnn_tpu.models.mm_mamba import (MultimodalityMamba,  # noqa: E402
                                         NonLocalBlock2D, TokenLearner)

m = MultimodalityMamba(img_size=9, in_channels1=144, in_channels2=1,
                       dim_embedding=32, n_classes=15)
h9 = jax.random.normal(key, (B, 9, 9, 144))
l9 = jax.random.normal(key, (B, 9, 9, 1))
v = jax.jit(m.init, static_argnames=("train",))(
    {"params": key, "dropout": key}, h9[:2], l9[:2], train=False)
apply_bf16 = bf16_apply(m.apply)
bench(lambda a, b: apply_bf16(v, a, b, train=False), h9, l9,
      label="full flagship fwd bf16 (B=4096)")

# the two backbones separately (bf16): where does the 91 ms/4096 go?
from vit_cnn_tpu.nn.mamba import (DirectionalMambaBackbone,  # noqa: E402
                                  MultiDirMambaLayer)

bb1 = DirectionalMambaBackbone(embed_dims=144, num_layers=1,
                               feedforward_channels=72, img_size=9,
                               in_channels=144, path_type="81_2+8")
x1 = jax.random.normal(key, (B, 9, 9, 144))
v1 = jax.jit(bb1.init, static_argnames=("train",))(
    {"params": key, "dropout": key}, x1[:2], train=False)
a1 = bf16_apply(bb1.apply)
bench(lambda a: a1(v1, a, train=False), x1,
      label="backbone1 bf16 (81 tok, 144ch)")

bb2 = DirectionalMambaBackbone(embed_dims=256, num_layers=1,
                               feedforward_channels=128, img_size=7,
                               in_channels=256, path_type="49_2+8")
x2 = jax.random.normal(key, (B, 7, 7, 256))
v2 = jax.jit(bb2.init, static_argnames=("train",))(
    {"params": key, "dropout": key}, x2[:2], train=False)
a2 = bf16_apply(bb2.apply)
bench(lambda a: a2(v2, a, train=False), x2,
      label="backbone2 bf16 (49 tok, 256ch)")

# multidir layer alone at backbone1 dims (bf16, after one-hot permutes)
ml = MultiDirMambaLayer(144, 72, path_type="81_2+8")
tk = jax.random.normal(key, (B, 81, 144)).astype(jnp.bfloat16)
vm = jax.jit(ml.init)({"params": key}, tk[:2].astype(jnp.float32))
vmb = jax.tree_util.tree_map(
    lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, vm)
bench(lambda a: ml.apply(vmb, a), tk,
      label="multidir layer bf16 (B,81,144)")

tl = TokenLearner(49)
x7 = jax.random.normal(key, (B, 7, 7, 256)).astype(jnp.bfloat16)
vt = jax.jit(tl.init, static_argnames=("train",))(
    {"params": key}, x7[:2].astype(jnp.float32), train=False)
vtb = jax.tree_util.tree_map(
    lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, vt)
bench(lambda a: tl.apply(vtb, a, False), x7,
      label="TokenLearner bf16 (B,7,7,256)")

nl = NonLocalBlock2D(256)
vn = jax.jit(nl.init, static_argnames=("train",))(
    {"params": key}, x7[:2].astype(jnp.float32),
    x7[:2].astype(jnp.float32), x7[:2].astype(jnp.float32), train=False)
vnb = jax.tree_util.tree_map(
    lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, vn)
bench(lambda a: nl.apply(vnb, a, a, a, False), x7,
      label="NonLocal bf16 (B,7,7,256)")
