"""Train-step batch-size sweep for the flagship (round 5): does widening
the batch amortize the ~2 ms/step dispatch+fixed cost toward the ~21k
patches/s target, and where does the adjoint VMEM stop scaling?

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 3600 python perf/train_batch_sweep.py [batch ...]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vct_jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

H, W, BANDS, CLASSES, PATCH = 349, 1905, 144, 15, 9


def measure(batch):
    from vit_cnn_tpu.models.registry import get_model
    from vit_cnn_tpu.pipeline.patches import AugmentConfig, PatchPipeline
    from vit_cnn_tpu.train.loop import Trainer

    rng = np.random.RandomState(0)
    img1 = rng.rand(H, W, BANDS).astype(np.float32)
    img2 = rng.rand(H, W, 1).astype(np.float32)
    gt = rng.randint(1, CLASSES, size=(H, W)).astype(np.int32)
    module, _, hp = get_model(
        "Multimodality_Mamba", dataset="Synthetic", n_classes=CLASSES,
        n_bands=(BANDS, 1), ignored_labels=[0], patch_size=PATCH,
        batch_size=batch, epoch=1, bf16=True, flip_augmentation=True)
    pipeline = PatchPipeline(
        img1, img2, gt, patch_size=PATCH, ignored_labels=[0],
        n_classes=CLASSES, augment=AugmentConfig(flip=True),
        supervision="full")
    trainer = Trainer(module, hp, pipeline, val_pipeline=None,
                      save_checkpoints=False)
    order = pipeline.epoch_order(trainer.np_rng)
    reps = -(-batch // len(order))
    centers = jnp.asarray(np.tile(order, (reps, 1))[:batch])
    valid = jnp.ones(batch, jnp.float32)

    def one_step():
        trainer.data_key, sub = jax.random.split(trainer.data_key)
        trainer.state, loss = trainer._step(trainer.state, centers, valid,
                                            sub, trainer._arrays,
                                            jnp.float32(0.0))
        return loss

    t0 = time.time()
    loss = one_step()
    _ = float(loss)
    print(f"batch {batch}: compile+first {time.time() - t0:.1f}s",
          flush=True)
    steps, t0 = 0, time.time()
    while time.time() - t0 < 6.0:
        loss = one_step()
        steps += 1
    _ = float(loss)
    dt = time.time() - t0
    rate = steps * batch / dt
    print(f"batch {batch}: {rate:.0f} patches/s/chip "
          f"({steps} steps in {dt:.2f}s, {dt / steps * 1e3:.2f} ms/step)",
          flush=True)
    return rate


for b in [int(a) for a in sys.argv[1:]] or (1024, 2048, 4096):
    try:
        measure(b)
    except Exception as e:  # noqa: BLE001 — sweep survives OOM points
        print(f"batch {b}: FAILED {str(e)[:200]}", flush=True)
