"""Decompose the warm full-scene serving wall into upload | compute |
download for the flagship, comparing f32-resident vs bf16-resident scene
compute (is the bf16 scene gather slower?) and fori_loop-scene-program vs
per-band dispatch. Informs ROOFLINE round-3 serving work.

Usage: timeout 1800 python perf/serve_decomp.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vct_jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from functools import partial

H, W, BANDS, CLASSES, PATCH, ROWS = 349, 1905, 144, 15, 9, 4


def timed(label, f, n=2):
    f()
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    print("%-52s %7.2f s (min %.2f)" % (label, np.mean(ts), min(ts)),
          flush=True)
    return min(ts)


def main():
    from vit_cnn_tpu.infer.fullscene import (_band_scatter,
                                             _bf16_cached,
                                             _scene_scatter_fn)
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
    t_pad = -total % ROWS
    n_bands = (total + t_pad) // ROWS

    def pad(scene):
        z = np.zeros((t_pad,) + scene.shape[1:], scene.dtype)
        return np.concatenate([scene, z], axis=0)

    up = {}
    for name, dt in (("f32", np.float32), ("bf16", ml_dtypes.bfloat16)):
        s1h, s2h = pad(img1.astype(dt)), pad(img2.astype(dt))

        def upload():
            a = jax.device_put(s1h)
            b = jax.device_put(s2h)
            float(jnp.sum(a[0, 0].astype(jnp.float32)))
            float(jnp.sum(b[0, 0].astype(jnp.float32)))
            return a, b

        timed(f"upload scene {name}", upload)
        s1, s2 = upload()
        up[name] = (s1, s2)

        probs0 = jnp.zeros((H + t_pad, W, CLASSES), jnp.float32)
        scene_prog = jax.jit(partial(
            _scene_scatter_fn, rows=ROWS, patch_size=p, n_bands=n_bands,
            apply_fn=apply_fn))

        def run_scene():
            pr = scene_prog(probs0, s1, s2, jnp.int32(total), variables)
            return np.asarray(pr[:H])

        timed(f"scene fori_loop program, {name}-resident", run_scene)

        def run_bands():
            pr = probs0
            for x0 in range(0, total + t_pad, ROWS):
                pr = _band_scatter(pr, s1, s2, x0, total, variables,
                                   rows=ROWS, patch_size=p,
                                   apply_fn=apply_fn)
            return np.asarray(pr[:H])

        timed(f"per-band dispatch loop, {name}-resident", run_bands)


if __name__ == "__main__":
    main()
