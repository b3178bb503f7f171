"""Train-step roofline decomposition for the flagship (VERDICT r2 #2).

Splits the one-program jitted train step (train/loop.py: gather+augment ->
bf16 fwd -> bwd -> AdamW) into nested-subset timings at the bench
configuration (batch 1024, Houston-sized scene, bf16 compute / f32 master
params). Differences between the nested programs give the per-phase cost:

  gather+augment           = t(make_batch)
  forward                  = t(loss fwd) - t(make_batch)
  backward                 = t(value_and_grad) - t(loss fwd)
  optimizer (AdamW+casts)  = t(full step) - t(value_and_grad)

All timings fence on a host transfer (the tunneled backend's
block_until_ready does not block). Usage:
  JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
    timeout 2400 python perf/profile_train.py
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

H, W, BANDS, CLASSES, PATCH, BATCH = 349, 1905, 144, 15, 9, 1024


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .astype(jnp.float32)))


def bench(f, *args, n=16, label=""):
    out = f(*args)
    fence(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    fence(out)
    ms = (time.time() - t0) / n * 1e3
    print("%-44s %8.2f ms" % (label, ms), flush=True)
    return ms


def main():
    from vit_cnn_tpu.models.registry import get_model
    from vit_cnn_tpu.nn.precision import cast_floating
    from vit_cnn_tpu.pipeline.patches import AugmentConfig, PatchPipeline
    from vit_cnn_tpu.train.loop import Trainer
    from vit_cnn_tpu.utils.envflags import bench_stamp, stamp_str

    # self-describing A/B logs: VCT_DIRSTREAM_FUSED_BWD=1 vs 0 is the
    # decisive in-step backward experiment (VERDICT r4 #2)
    print("bench-stamp:", stamp_str(bench_stamp()), flush=True)

    rng = np.random.RandomState(0)
    img1 = rng.rand(H, W, BANDS).astype(np.float32)
    img2 = rng.rand(H, W, 1).astype(np.float32)
    gt = rng.randint(1, CLASSES, size=(H, W)).astype(np.int32)

    module, _, hp = get_model(
        "Multimodality_Mamba", dataset="Synthetic", n_classes=CLASSES,
        n_bands=(BANDS, 1), ignored_labels=[0], patch_size=PATCH,
        batch_size=BATCH, epoch=1, bf16=True, flip_augmentation=True)
    pipeline = PatchPipeline(
        img1, img2, gt, patch_size=PATCH, ignored_labels=[0],
        n_classes=CLASSES, augment=AugmentConfig(flip=True),
        supervision="full")
    trainer = Trainer(module, hp, pipeline, val_pipeline=None,
                      save_checkpoints=False)
    state = trainer.state
    arrays = trainer._arrays
    loss_fn = trainer.loss_fn
    weights = trainer.class_weights

    key = jax.random.PRNGKey(0)
    order = pipeline.epoch_order(trainer.np_rng)
    centers = jnp.asarray(order[:BATCH])
    valid = jnp.ones((BATCH,), jnp.float32)

    # ---- nested-subset programs (mirror Trainer._build_step) -----------
    def make_batch(rng_, arrays_):
        data_key, _ = jax.random.split(rng_)
        return pipeline.make_batch(data_key, centers, train=True,
                                   arrays=arrays_)

    def loss_of(params, batch_stats, p1, p2, labels, dropout_key):
        vs = {"params": cast_floating(params, jnp.bfloat16)}
        mutable = []
        if batch_stats:
            vs["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out = module.apply(vs, p1.astype(jnp.bfloat16),
                           p2.astype(jnp.bfloat16), train=True,
                           mutable=mutable, rngs={"dropout": dropout_key})
        if mutable:
            out, updates = out
        else:
            updates = {}
        out = cast_floating(out, jnp.float32)
        return loss_fn(out, labels, weights, valid), updates

    def fwd_only(st, rng_, arrays_):
        data_key, dropout_key = jax.random.split(rng_)
        p1, p2, labels = pipeline.make_batch(data_key, centers, train=True,
                                             arrays=arrays_)
        loss, _ = loss_of(st.params, st.batch_stats, p1, p2, labels,
                          dropout_key)
        return loss

    def grad_only(st, rng_, arrays_):
        data_key, dropout_key = jax.random.split(rng_)
        p1, p2, labels = pipeline.make_batch(data_key, centers, train=True,
                                             arrays=arrays_)
        (loss, _), grads = jax.value_and_grad(loss_of, has_aux=True)(
            st.params, st.batch_stats, p1, p2, labels, dropout_key)
        return loss, grads

    t_gather = bench(jax.jit(make_batch), key, arrays,
                     label="gather+augment (make_batch)")
    t_fwd = bench(jax.jit(fwd_only), state, key, arrays,
                  label="+ bf16 forward (loss)")
    t_grad = bench(jax.jit(grad_only), state, key, arrays,
                   label="+ backward (value_and_grad)")

    # full step: the Trainer's own jitted program
    def full(st):
        st, loss_sum = trainer._step(st, centers, valid, key, arrays,
                                     jnp.float32(0.0))
        return st, loss_sum

    st2, ls = full(state)
    fence(ls)
    n = 16
    st = state
    t0 = time.time()
    for _ in range(n):
        st, ls = full(st)
    fence(ls)
    t_full = (time.time() - t0) / n * 1e3
    print("%-44s %8.2f ms" % ("full step (Trainer._step, +AdamW)", t_full),
          flush=True)

    print("\nphase decomposition (ms / %d-patch step):" % BATCH)
    rows = [("gather+augment", t_gather),
            ("forward (bf16)", t_fwd - t_gather),
            ("backward", t_grad - t_fwd),
            ("optimizer+casts", t_full - t_grad)]
    for name, ms in rows:
        print("  %-24s %7.2f ms  (%4.1f%%)" % (name, ms,
                                               100 * ms / t_full))
    print("  %-24s %7.2f ms" % ("total", t_full))
    print("throughput: %.0f patches/s/chip" % (BATCH / t_full * 1e3))


if __name__ == "__main__":
    main()
