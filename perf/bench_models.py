"""Per-model serving AND training throughput on the real TPU chip for all
14 registry models (VERDICT r2 #3: "complete the per-model perf table —
serving AND train, all 14 configs").

Serving = stride-1 row-band full-scene path, bf16 forward / f32
accumulation, Houston2013-sized synthetic scene. Train = one jitted
gather+augment+fwd/bwd+optimizer program per batch (batch 1024; halved on
OOM), bf16 compute / f32 master params.

Usage:
  JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
    timeout 3600 python perf/bench_models.py [model ...]
  Optional: VCT_BENCH_PHASE=serve|train|both (default both).
Each model costs ~2-6 min (dominated by tunnel compiles). Prints a
markdown table; per-model numbers also land on stderr as they finish.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

H, W, BANDS, CLASSES = 349, 1905, 144, 15

ALL = ["EndNet", "Early_fusion_CNN", "Middle_fusion_CNN", "Late_fusion_CNN",
       "Cross_fusion_CNN", "S2ENet", "SpectralFormer", "S2EFT", "FusAtNet",
       "MFT", "HCTnet", "MHST", "GLT_Net", "Multimodality_Mamba"]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(name, img1, img2, batch_size=1024):
    from vit_cnn_tpu.data.normalize import apply_pca
    from vit_cnn_tpu.models import get_model

    hp = {"n_classes": CLASSES, "n_bands": (BANDS, 1),
          "ignored_labels": [0], "dataset": "Synthetic", "bf16": True,
          "batch_size": batch_size, "epoch": 1,
          "flip_augmentation": True}
    module, spec, hp = get_model(name, **hp)
    img = img1
    if hp.get("applyPCA"):
        img = apply_pca(img1, hp["pca_components"])
    return module, hp, img


def measure_serving(name, img1, img2, budget_s=6.0, rows=None):
    from vit_cnn_tpu.infer.fullscene import _band_scatter, _bf16_cached

    module, hp, img = build(name, img1, img2)
    p = int(hp["patch_size"])

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
    if rows is None:
        rows = max(1, 4096 * 4 // wc)      # ~4 origin rows per program
        if p >= 11:                        # big-patch models: ~1 GB bands
            rows = max(1, rows // 2)
    probs = jnp.zeros((H, W, CLASSES), jnp.float32)

    def run_band(pr, x0):
        return _band_scatter(pr, scene1, scene2, x0, total, variables,
                             rows=rows, patch_size=p, apply_fn=apply_fn)

    t0 = time.time()
    probs = run_band(probs, 0)
    _ = float(jnp.sum(probs))
    log(f"{name}: serving compile+first band {time.time() - t0:.1f}s "
        f"(patch {p}, rows {rows}, {rows * wc} windows/band)")

    bands_done = 0
    t0 = time.time()
    while time.time() - t0 < budget_s and (bands_done + 2) * rows < total:
        probs = run_band(probs, (bands_done + 1) * rows)
        bands_done += 1
    _ = float(jnp.sum(probs))
    dt = time.time() - t0
    rate = bands_done * rows * wc / dt
    log(f"{name}: serving {rate:.0f} patches/s/chip ({bands_done} bands "
        f"in {dt:.2f}s)")
    return p, rate


def measure_train(name, img1, img2, batch_size=1024, budget_s=6.0):
    from vit_cnn_tpu.pipeline.patches import AugmentConfig, PatchPipeline
    from vit_cnn_tpu.train.loop import Trainer

    while batch_size >= 128:
        try:
            module, hp, img = build(name, img1, img2, batch_size)
            p = int(hp["patch_size"])
            rng = np.random.RandomState(0)
            gt = rng.randint(1, CLASSES, size=(H, W)).astype(np.int32)
            pipeline = PatchPipeline(
                img, img2, gt, patch_size=p, ignored_labels=[0],
                n_classes=CLASSES, augment=AugmentConfig(flip=True),
                supervision=hp.get("supervision", "full"))
            trainer = Trainer(module, hp, pipeline, val_pipeline=None,
                              save_checkpoints=False)
            order = pipeline.epoch_order(trainer.np_rng)
            reps = -(-batch_size // len(order))
            centers = jnp.asarray(np.tile(order, (reps, 1))[:batch_size])
            valid = jnp.ones(batch_size, jnp.float32)

            def one_step():
                trainer.data_key, sub = jax.random.split(trainer.data_key)
                trainer.state, loss = trainer._step(
                    trainer.state, centers, valid, sub, trainer._arrays,
                    jnp.float32(0.0))
                return loss

            t0 = time.time()
            loss = one_step()
            _ = float(loss)
            log(f"{name}: train compile+first step {time.time() - t0:.1f}s "
                f"(batch {batch_size})")
            steps = 0
            t0 = time.time()
            while time.time() - t0 < budget_s:
                loss = one_step()
                steps += 1
            _ = float(loss)
            dt = time.time() - t0
            rate = steps * batch_size / dt
            log(f"{name}: train {rate:.0f} patches/s/chip ({steps} steps "
                f"of {batch_size} in {dt:.2f}s, loss {float(loss):.4f})")
            return batch_size, rate
        except Exception as e:
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg \
                    or "exceeds" in msg:
                log(f"{name}: batch {batch_size} OOM, halving")
                batch_size //= 2
                continue
            raise
    raise RuntimeError(f"{name}: train failed at batch >= 128")


def main():
    from vit_cnn_tpu.utils.envflags import bench_stamp, stamp_str

    names = sys.argv[1:] or ALL
    phase = os.environ.get("VCT_BENCH_PHASE", "both")
    # code-epoch stamp: paste the comment line with the table into
    # perf/ROOFLINE.md — tests/test_benchstamp.py enforces freshness
    stamp = stamp_str(bench_stamp())
    print(f"<!-- bench-stamp: table=models {stamp} -->", flush=True)
    log("bench-stamp:", stamp)
    rng = np.random.RandomState(0)
    img1 = rng.rand(H, W, BANDS).astype(np.float32)
    img2 = rng.rand(H, W, 1).astype(np.float32)
    table = []
    for name in names:
        p = serve = tbs = train = None
        if phase in ("both", "serve"):
            for band_rows in (None, 2, 1):
                try:
                    p, serve = measure_serving(name, img1, img2,
                                               rows=band_rows)
                    break
                except Exception as e:
                    msg = str(e)
                    if band_rows != 1 and ("RESOURCE_EXHAUSTED" in msg
                                           or "Out of memory" in msg
                                           or "exceeds" in msg):
                        log(f"{name}: serving rows={band_rows} OOM, "
                            "shrinking")
                        continue
                    log(f"{name}: serving FAILED {msg[:200]}")
                    break
        if phase in ("both", "train"):
            try:
                tbs, train = measure_train(name, img1, img2)
            except Exception as e:
                log(f"{name}: train FAILED {str(e)[:200]}")
        table.append((name, p, serve, tbs, train))
        fmt = lambda v: f"{v:,.0f}" if v else "-"
        print(f"| {name} | {p or '-'} | {fmt(serve)} | {fmt(train)} |",
              flush=True)
    print()
    print("| Model | patch | serving patches/s/chip | train patches/s/chip |")
    print("|---|---|---|---|")
    for name, p, serve, tbs, train in table:
        fmt = lambda v: f"{v:,.0f}" if v else "-"
        print(f"| {name} | {p or '-'} | {fmt(serve)} | {fmt(train)} |")


if __name__ == "__main__":
    main()
