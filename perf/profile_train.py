"""Train-step decomposition of the flagship (VERDICT r2 #2: ">50% of the
59 ms step is unaccounted"). Splits the jitted step into nested programs
and times each on the real chip (fenced on host transfers):

  gather+augment | + forward loss | + backward | + AdamW update (full)

plus a batch-size scaling row. Components come out by subtraction; the
scan backward kernels were measured separately in perf/bwd_sweep.py.

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 1800 python perf/profile_train.py [batch ...]
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

H, W, BANDS, CLASSES, PATCH = 349, 1905, 144, 15, 9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(f, args, n=8, label=""):
    out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _i in range(n):
        out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ms = (time.time() - t0) / n * 1e3
    print("%-52s %8.2f ms" % (label, ms), flush=True)
    return ms


def main(batch_sizes=(1024,)):
    from vit_cnn_tpu.models.registry import get_model
    from vit_cnn_tpu.nn.precision import cast_floating
    from vit_cnn_tpu.pipeline.patches import AugmentConfig, PatchPipeline
    from vit_cnn_tpu.train.loop import Trainer

    rng = np.random.RandomState(0)
    img1 = rng.rand(H, W, BANDS).astype(np.float32)
    img2 = rng.rand(H, W, 1).astype(np.float32)
    gt = rng.randint(1, CLASSES, size=(H, W)).astype(np.int32)

    for bs in batch_sizes:
        module, _, hp = get_model(
            "Multimodality_Mamba", dataset="Synthetic", n_classes=CLASSES,
            n_bands=(BANDS, 1), ignored_labels=[0], patch_size=PATCH,
            batch_size=bs, epoch=1, bf16=True, flip_augmentation=True)
        pipeline = PatchPipeline(
            img1, img2, gt, patch_size=PATCH, ignored_labels=[0],
            n_classes=CLASSES, augment=AugmentConfig(flip=True),
            supervision="full")
        trainer = Trainer(module, hp, pipeline, val_pipeline=None,
                          save_checkpoints=False)
        arrays = trainer._arrays
        state = trainer.state
        loss_fn = trainer.loss_fn
        class_weights = trainer.class_weights

        order = pipeline.epoch_order(trainer.np_rng)
        reps = -(-bs // len(order))
        centers = jnp.asarray(np.tile(order, (reps, 1))[:bs])
        valid = jnp.ones(bs, jnp.float32)
        rng_step = jax.random.PRNGKey(0)

        def make_batch(rng, centers, arrays):
            data_key, dropout_key = jax.random.split(rng)
            return pipeline.make_batch(data_key, centers, train=True,
                                       arrays=arrays)

        def loss_of(params, batch_stats, p1, p2, labels, dropout_key):
            variables = {"params": cast_floating(params, jnp.bfloat16)}
            mutable = []
            if batch_stats:
                variables["batch_stats"] = batch_stats
                mutable = ["batch_stats"]
            out = module.apply(variables, p1.astype(jnp.bfloat16),
                               p2.astype(jnp.bfloat16), train=True,
                               mutable=mutable, rngs={"dropout": dropout_key})
            if mutable:
                out, updates = out
            out = cast_floating(out, jnp.float32)
            return loss_fn(out, labels, class_weights, valid)

        def fwd_only(state, centers, rng, arrays):
            data_key, dropout_key = jax.random.split(rng)
            p1, p2, labels = pipeline.make_batch(data_key, centers,
                                                 train=True, arrays=arrays)
            return loss_of(state.params, state.batch_stats, p1, p2, labels,
                           dropout_key)

        def fwd_bwd(state, centers, rng, arrays):
            data_key, dropout_key = jax.random.split(rng)
            p1, p2, labels = pipeline.make_batch(data_key, centers,
                                                 train=True, arrays=arrays)
            loss, grads = jax.value_and_grad(loss_of)(
                state.params, state.batch_stats, p1, p2, labels, dropout_key)
            return loss, grads

        print(f"== flagship train decomposition, batch {bs} ==")
        t_g = bench(jax.jit(make_batch), (rng_step, centers, arrays),
                    label=f"gather+augment (batch {bs})")
        t_f = bench(jax.jit(fwd_only), (state, centers, rng_step, arrays),
                    label="gather + forward loss")
        t_b = bench(jax.jit(fwd_bwd), (state, centers, rng_step, arrays),
                    label="gather + forward + backward")
        t_s = bench(lambda s, c, v, r, a, z: trainer._step(s, c, v, r, a, z),
                    (state, centers, valid, rng_step, arrays,
                     jnp.float32(0.0)),
                    label="full step (+ AdamW update)")
        print("  -> forward  {:.2f} ms | backward {:.2f} ms | "
              "optimizer+rest {:.2f} ms | gather {:.2f} ms".format(
                  t_f - t_g, t_b - t_f, t_s - t_b, t_g))
        rate = bs / (t_s / 1e3)
        print("  -> {:.0f} patches/s/chip at batch {}".format(rate, bs))


if __name__ == "__main__":
    sizes = tuple(int(a) for a in sys.argv[1:]) or (1024, 2048)
    main(sizes)
