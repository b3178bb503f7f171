"""Isolate the non-forward overhead of the stride-1 scene program:
run _scene_scatter_fn with (a) the real flagship apply, (b) an identity
apply (gather + trivial reduce + scatter only). Difference = model time;
identity wall = band machinery cost (im2col stack, probs accumulate,
fori bookkeeping).

Usage: timeout 1200 python perf/band_overhead_probe.py [rows]
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
import ml_dtypes
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

H, W, BANDS, CLASSES, PATCH = 349, 1905, 144, 15, 9


def main():
    from vit_cnn_tpu.infer.fullscene import _scene_scatter_fn

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    rng = np.random.RandomState(0)
    img1 = rng.rand(H, W, BANDS).astype(np.float32)
    img2 = rng.rand(H, W, 1).astype(np.float32)

    p = PATCH
    total = H - p + 1
    t_pad = -total % rows
    n_bands = (total + t_pad) // rows

    def pad(x):
        z = np.zeros((t_pad,) + x.shape[1:], x.dtype)
        return np.concatenate([x, z], 0).astype(ml_dtypes.bfloat16)

    s1 = jax.device_put(pad(img1))
    s2 = jax.device_put(pad(img2))
    float(jnp.sum(s1[0, 0].astype(jnp.float32)))
    probs0 = jnp.zeros((H + t_pad, W, CLASSES), jnp.float32)

    def identity_apply(variables, p1, p2, train=False):
        # touch every gathered byte, produce (B, K) logits — no model
        a = jnp.sum(p1.astype(jnp.float32), axis=(1, 2))   # (B, C1)
        b = jnp.sum(p2.astype(jnp.float32), axis=(1, 2))   # (B, 1)
        return (a[:, :CLASSES] + b)

    variables = {}
    prog = jax.jit(partial(_scene_scatter_fn, rows=rows, patch_size=p,
                           n_bands=n_bands, apply_fn=identity_apply))

    def run():
        return np.asarray(
            prog(probs0, s1, s2, jnp.int32(total), variables)[:H])

    t0 = time.time()
    run()
    print("identity compile+first: %.1f s" % (time.time() - t0), flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    print("rows=%d identity-apply scene: %.2f s (min %.2f) "
          "-> machinery %.1f ms/band"
          % (rows, np.mean(ts), min(ts), min(ts) / n_bands * 1e3),
          flush=True)


if __name__ == "__main__":
    main()
