"""Band-geometry sweep for stride-1 serving (resident bf16 scene):
whole-scene wall for rows in {2,4,8}, plus the BARE forward at the same
windows-per-band batch — isolates gather/scatter/layout overhead of the
band program from the model forward itself.

Usage: timeout 2400 python perf/band_sweep.py [rows ...]
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
    from vit_cnn_tpu.infer.fullscene import _bf16_cached, _scene_scatter_fn
    from vit_cnn_tpu.models.mm_mamba import MultimodalityMamba

    rng = np.random.RandomState(0)
    img1 = rng.rand(H, W, BANDS).astype(np.float32)
    img2 = rng.rand(H, W, 1).astype(np.float32)

    module = MultimodalityMamba(img_size=PATCH, in_channels1=BANDS,
                                in_channels2=1, dim_embedding=32,
                                n_classes=CLASSES)
    key = jax.random.PRNGKey(0)
    d1 = jnp.zeros((2, PATCH, PATCH, BANDS), jnp.float32)
    d2 = jnp.zeros((2, PATCH, PATCH, 1), jnp.float32)
    variables = jax.jit(module.init, static_argnames=("train",))(
        {"params": key, "dropout": key}, d1, d2, train=False)
    apply_fn = _bf16_cached(module.apply)

    p = PATCH
    total = H - p + 1
    wc = W - p + 1
    n_windows = total * wc

    rows_list = [int(a) for a in sys.argv[1:]] or [2, 4, 8]
    for rows in rows_list:
        t_pad = -total % rows
        n_bands = (total + t_pad) // rows

        def pad(scene):
            z = np.zeros((t_pad,) + scene.shape[1:], scene.dtype)
            return np.concatenate([scene, z], 0).astype(ml_dtypes.bfloat16)

        s1 = jax.device_put(pad(img1))
        s2 = jax.device_put(pad(img2))
        float(jnp.sum(s1[0, 0].astype(jnp.float32)))
        probs0 = jnp.zeros((H + t_pad, W, CLASSES), jnp.float32)
        prog = jax.jit(partial(_scene_scatter_fn, rows=rows, patch_size=p,
                               n_bands=n_bands, apply_fn=apply_fn))

        def run():
            return np.asarray(
                prog(probs0, s1, s2, jnp.int32(total), variables)[:H])

        run()
        ts = []
        for _ in range(2):
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
        t = min(ts)
        print("rows=%-3d bands=%-3d  scene %6.2f s  -> %6.0f patches/s"
              % (rows, n_bands, t, n_windows / t), flush=True)

        # bare forward at the same windows-per-band batch
        bb = rows * wc
        x1 = jnp.asarray(rng.rand(bb, p, p, BANDS).astype(np.float32)
                         .astype(ml_dtypes.bfloat16))
        x2 = jnp.asarray(rng.rand(bb, p, p, 1).astype(np.float32)
                         .astype(ml_dtypes.bfloat16))
        fwd = jax.jit(lambda v, a, b: apply_fn(v, a, b, train=False))
        out = fwd(variables, x1, x2)
        o = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(o.astype(jnp.float32)[0]))
        n = max(2, int(4e6 // bb))
        t0 = time.time()
        for _ in range(n):
            out = fwd(variables, x1, x2)
        o = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(o.astype(jnp.float32)[0]))
        per = (time.time() - t0) / n
        print("         bare fwd batch %-6d %7.1f ms  -> scene-equiv "
              "%6.2f s" % (bb, per * 1e3, per * n_bands), flush=True)


if __name__ == "__main__":
    main()
