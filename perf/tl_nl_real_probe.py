"""Real-module TokenLearner / NonLocal timings + the conv-as-GEMM
reshape variant (params untouched; 1x1 conv on (N, 1, 1, C) lowers to a
plain dot). Quantifies how much of the 5.6/5.2 ms (profile_bf16) the
module implementations leave on the table vs the hand-written matmul
formulations in perf/tl_nl_probe.py (2.7/2.6 ms).

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 900 python perf/tl_nl_real_probe.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vct_jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from vit_cnn_tpu.models.mm_mamba import NonLocalBlock2D, TokenLearner
from vit_cnn_tpu.nn.precision import bf16_apply

B, H, W, C, S = 4096, 7, 7, 256, 49


def bench(fn, *args, n=20, label=""):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32)))
    t0 = time.time()
    for _i in range(n):
        out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32)))
    ms = (time.time() - t0) / n * 1e3
    print("%-56s %8.2f ms" % (label, ms), flush=True)
    return ms


class TokenLearnerGemm(nn.Module):
    """TokenLearner with the 1x1 conv applied at (N, 1, 1, 2) and the
    weighted mean as one flattened GEMM — identical params and math."""

    num_tokens: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        from vit_cnn_tpu.nn.layers import BatchNorm

        b, h, w, c = x.shape
        mx = jnp.max(x, axis=-1, keepdims=True)
        avg = jnp.mean(x, axis=-1, keepdims=True)
        comb = jnp.concatenate([mx, avg], axis=-1).reshape(-1, 1, 1, 2)
        fmap = nn.Conv(self.num_tokens, (1, 1), name="conv")(comb)
        fmap = fmap.reshape(b, h * w, self.num_tokens)
        fmap = BatchNorm(use_running_average=not train, name="bn")(fmap)
        wgt = nn.sigmoid(nn.relu(fmap))                  # (B, HW, S)
        xf = x.reshape(b, h * w, c)
        return jnp.einsum("bls,blc->bsc", wgt, xf) / (h * w)


def main():
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    print("devices:", jax.devices(), flush=True)

    tl = TokenLearner(num_tokens=S)
    v = tl.init(key, x[:2])
    ap = bf16_apply(tl.apply)
    bench(lambda a: ap(v, a, train=False), x,
          label="TokenLearner real module (bf16 wrapper)")

    tg = TokenLearnerGemm(num_tokens=S)
    vg = tg.init(key, x[:2])
    apg = bf16_apply(tg.apply)
    # correctness vs the real module (same param SHAPES; copy over)
    vg2 = jax.tree_util.tree_map(lambda a, b: b, vg, v)
    o1 = ap(v, x[:64], train=False)
    o2 = apg(vg2, x[:64], train=False)
    print("TL gemm max abs diff: %.2e"
          % float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                  - o2.astype(jnp.float32)))), flush=True)
    bench(lambda a: apg(vg2, a, train=False), x,
          label="TokenLearner conv-as-GEMM variant")

    nl = NonLocalBlock2D(in_channels=C)
    vn = nl.init(key, x[:2], x[:2], x[:2])
    apn = bf16_apply(nl.apply)
    bench(lambda a: apn(vn, a, a, a, train=False), x,
          label="NonLocal real module (bf16 wrapper)")


if __name__ == "__main__":
    main()
