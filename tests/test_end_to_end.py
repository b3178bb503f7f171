"""Integration: micro-train EndNet on the synthetic scene, run full-scene
inference, check loss decreases and metrics are sane (SURVEY.md §4)."""

from functools import partial

import numpy as np
import pytest

from vit_cnn_tpu.data import sample_gt
from vit_cnn_tpu.infer import full_scene_probabilities, sliding_window_origins
from vit_cnn_tpu.metrics import metrics
from vit_cnn_tpu.models import get_model
from vit_cnn_tpu.pipeline import PatchPipeline
from vit_cnn_tpu.train import Trainer


def test_sliding_window_origin_parity():
    # parity vs. ref utils.sliding_window for stride 1 and 2, incl. clamping
    def ref_origins(H, W, p, step):
        offset_w = (H - p) % step
        offset_h = (W - p) % step
        out = []
        for x in range(0, H - p + offset_w + 1, step):
            if x + p > H:
                x = H - p
            for y in range(0, W - p + offset_h + 1, step):
                if y + p > W:
                    y = W - p
                out.append((x, y))
        return np.array(out)

    for (H, W, p, s) in [(7, 7, 3, 1), (8, 8, 3, 2), (10, 13, 5, 3),
                         (349, 19, 9, 1), (12, 12, 1, 1)]:
        got = sliding_window_origins(H, W, p, s)
        np.testing.assert_array_equal(got, ref_origins(H, W, p, s))


@pytest.fixture(scope="module")
def trained(synthetic_scene_module):
    img1, img2, gt = synthetic_scene_module
    # 'random' mode is parity-faithfully unseeded (global np.random); pin
    # the global stream for order-independence across the suite
    np.random.seed(0)
    train_gt, test_gt = sample_gt(gt, 0.5, mode="random", seed=0)
    hp = {
        "n_classes": 5, "n_bands": (img1.shape[-1], 1),
        "ignored_labels": [0], "dataset": "Synthetic",
        "patch_size": 1, "epoch": 8, "batch_size": 64, "test_stride": 1,
    }
    module, spec, hp = get_model("EndNet", **hp)
    pipe = PatchPipeline(img1, img2, train_gt, hp["patch_size"],
                         hp["ignored_labels"], hp["n_classes"])
    val_pipe = PatchPipeline(img1, img2, test_gt, hp["patch_size"],
                             hp["ignored_labels"], hp["n_classes"])
    trainer = Trainer(module, hp, pipe, val_pipe, seed=0,
                      checkpoint_root="/tmp/vct_test_ckpt")
    best = trainer.fit(dataset_name="Synthetic")
    return module, best, trainer, hp, (img1, img2, gt, test_gt)


@pytest.fixture(scope="module")
def synthetic_scene_module():
    import os
    from vit_cnn_tpu.data.registry import _synthetic_loader

    os.environ["VCT_SYN_H"] = "40"
    os.environ["VCT_SYN_W"] = "36"
    os.environ["VCT_SYN_BANDS"] = "16"
    os.environ["VCT_SYN_CLASSES"] = "5"
    try:
        return _synthetic_loader("")
    finally:
        for k in ("VCT_SYN_H", "VCT_SYN_W", "VCT_SYN_BANDS",
                  "VCT_SYN_CLASSES"):
            os.environ.pop(k, None)


def test_loss_decreases(trained):
    _, _, trainer, _, _ = trained
    assert trainer.log.losses[-1] < trainer.log.losses[0]


def test_full_scene_inference_shape_and_accuracy(trained):
    module, best, trainer, hp, (img1, img2, gt, test_gt) = trained
    probs = full_scene_probabilities(module, best, img1, img2, hp, chunk=512)
    assert probs.shape == (img1.shape[0], img1.shape[1], 5)
    pred = np.argmax(probs, axis=-1)
    r = metrics(pred, test_gt, ignored_labels=[0], n_classes=5)
    # synthetic scene is easily separable: expect strong accuracy
    assert r["Accuracy"] > 70.0


def test_checkpoint_roundtrip(trained, tmp_path):
    from vit_cnn_tpu.train import restore_checkpoint, save_checkpoint

    module, best, trainer, hp, _ = trained
    path = save_checkpoint(best, str(tmp_path), "endnet", "Synthetic")
    loaded = restore_checkpoint(path, target=best)
    leaves1 = [np.asarray(x) for x in
               __import__("jax").tree_util.tree_leaves(best)]
    leaves2 = [np.asarray(x) for x in
               __import__("jax").tree_util.tree_leaves(loaded)]
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(a, b)


def test_band_path_matches_generic_origins_path(trained):
    """The stride-1 row-band fast path (infer/fullscene.py:_band_scatter_fn)
    must produce the identical probability map as the generic per-origin
    chunked path, including the untouched border rows/cols and the
    row-remainder padding (40 - 1 + 1 = 40 origin rows vs band rows that do
    not divide them)."""
    import jax.numpy as jnp

    from vit_cnn_tpu.infer.fullscene import (_band_scatter, _chunk_scatter,
                                             sliding_window_origins)

    module, best, trainer, hp, (img1, img2, _, _) = trained
    p = int(hp["patch_size"])
    h, w = img1.shape[:2]
    k = 5

    scene1 = jnp.asarray(img1, jnp.float32)
    scene2 = jnp.asarray(img2, jnp.float32)

    # generic path, one chunk per call
    origins = sliding_window_origins(h, w, p, 1)
    probs_g = jnp.zeros((h, w, k), jnp.float32)
    for i in range(0, len(origins), 256):
        o = jnp.asarray(origins[i:i + 256])
        v = jnp.ones(len(o), jnp.float32)
        probs_g = _chunk_scatter(probs_g, scene1, scene2, o, v, best,
                                 patch_size=p, apply_fn=module.apply)

    # band path with rows=7 (does NOT divide the 40 origin rows -> padding)
    rows, total = 7, h - p + 1
    t_pad = -total % rows
    z1 = jnp.zeros((t_pad, w, scene1.shape[-1]), jnp.float32)
    z2 = jnp.zeros((t_pad, w, scene2.shape[-1]), jnp.float32)
    s1p = jnp.concatenate([scene1, z1], axis=0)
    s2p = jnp.concatenate([scene2, z2], axis=0)
    probs_b = jnp.zeros((h + t_pad, w, k), jnp.float32)
    for x0 in range(0, total + t_pad, rows):
        probs_b = _band_scatter(probs_b, s1p, s2p, x0, total, best,
                                rows=rows, patch_size=p,
                                apply_fn=module.apply)

    np.testing.assert_allclose(np.asarray(probs_b[:h]),
                               np.asarray(probs_g), rtol=1e-5, atol=1e-5)


def test_band_path_masks_padding_origins_patch5():
    """With P >= 3, padded origin rows produce logits whose center rows
    land INSIDE the image (center = origin + P//2 < H); the band path must
    zero them (this is the regression the P=1 fixture test cannot see)."""
    import jax.numpy as jnp

    from vit_cnn_tpu.infer.fullscene import (_band_scatter, _chunk_scatter,
                                             sliding_window_origins)

    rng = np.random.RandomState(7)
    p, h, w, c, k = 5, 17, 13, 3, 4
    img1 = jnp.asarray(rng.rand(h, w, c).astype(np.float32))
    img2 = jnp.asarray(rng.rand(h, w, 1).astype(np.float32))
    wmat = jnp.asarray(rng.rand(p * p * (c + 1), k).astype(np.float32))

    def apply_fn(variables, p1, p2, train=False):
        flat = jnp.concatenate([p1, p2], axis=-1).reshape(p1.shape[0], -1)
        return flat @ variables

    origins = sliding_window_origins(h, w, p, 1)
    probs_g = jnp.zeros((h, w, k), jnp.float32)
    for i in range(0, len(origins), 64):
        o = jnp.asarray(origins[i:i + 64])
        v = jnp.ones(len(o), jnp.float32)
        probs_g = _chunk_scatter(probs_g, img1, img2, o, v, wmat,
                                 patch_size=p, apply_fn=apply_fn)

    # rows=4 does not divide the 13 origin rows -> 3 padding origin rows,
    # whose centers fall at image rows 15..16 (< h): must stay zero-masked
    rows, total = 4, h - p + 1
    t_pad = -total % rows
    assert t_pad > 0
    z1 = jnp.zeros((t_pad, w, c), jnp.float32)
    z2 = jnp.zeros((t_pad, w, 1), jnp.float32)
    s1p = jnp.concatenate([img1, z1], axis=0)
    s2p = jnp.concatenate([img2, z2], axis=0)
    probs_b = jnp.zeros((h + t_pad, w, k), jnp.float32)
    for x0 in range(0, total + t_pad, rows):
        probs_b = _band_scatter(probs_b, s1p, s2p, x0, total, wmat,
                                rows=rows, patch_size=p, apply_fn=apply_fn)

    np.testing.assert_allclose(np.asarray(probs_b[:h]),
                               np.asarray(probs_g), rtol=1e-5, atol=1e-5)


def test_band_patches_match_window_gather_patch9():
    """band_patches (im2col by static shifts) must equal the per-origin
    window gather for a full row-band at patch 9."""
    import jax.numpy as jnp

    from vit_cnn_tpu.infer.fullscene import band_patches, gather_windows

    rng = np.random.RandomState(3)
    p, rows, w, c = 9, 3, 21, 4
    band = jnp.asarray(rng.rand(rows + p - 1, w, c).astype(np.float32))
    got = band_patches(band, rows, p)

    wc = w - p + 1
    origins = np.array([(r, j) for r in range(rows) for j in range(wc)],
                       np.int32)
    want = gather_windows(band, jnp.asarray(origins), p)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mesh_band_path_matches_generic(synthetic_scene):
    """The mesh-sharded stride-1 band serving path (band groups split over
    the 8-device 'data' axis, blocks assembled in one compiled program)
    must equal the generic per-origin path, including border zeros and
    padding-origin masking."""
    import jax
    import jax.numpy as jnp

    from vit_cnn_tpu.infer.fullscene import (_assemble_band_blocks,
                                             _chunk_scatter,
                                             _sharded_band_blocks,
                                             sliding_window_origins)
    from vit_cnn_tpu.parallel import make_mesh, shard_batch

    rng = np.random.RandomState(11)
    p, h, w, c, k = 5, 19, 14, 3, 4
    img1 = jnp.asarray(rng.rand(h, w, c).astype(np.float32))
    img2 = jnp.asarray(rng.rand(h, w, 1).astype(np.float32))
    wmat = jnp.asarray(rng.rand(p * p * (c + 1), k).astype(np.float32))

    def apply_fn(variables, p1, p2, train=False):
        flat = jnp.concatenate([p1, p2], axis=-1).reshape(p1.shape[0], -1)
        return flat @ variables

    origins = sliding_window_origins(h, w, p, 1)
    probs_g = jnp.zeros((h, w, k), jnp.float32)
    for i in range(0, len(origins), 64):
        o = jnp.asarray(origins[i:i + 64])
        v = jnp.ones(len(o), jnp.float32)
        probs_g = _chunk_scatter(probs_g, img1, img2, o, v, wmat,
                                 patch_size=p, apply_fn=apply_fn)

    mesh = make_mesh(8)
    rows, total = 2, h - p + 1             # 15 origin rows
    band_mult = rows * 8
    t_pad = -total % band_mult             # 1 -> padding origins exist
    assert t_pad > 0
    z1 = jnp.zeros((t_pad, w, c), jnp.float32)
    z2 = jnp.zeros((t_pad, w, 1), jnp.float32)
    s1p = jnp.concatenate([img1, z1], axis=0)
    s2p = jnp.concatenate([img2, z2], axis=0)
    step_fn = _sharded_band_blocks(mesh, rows, p, apply_fn)
    blocks = []
    for g0 in range(0, total + t_pad, band_mult):
        x0s = shard_batch(np.arange(g0, g0 + band_mult, rows,
                                    dtype=np.int32), mesh)
        blocks.append(step_fn(s1p, s2p, x0s, jnp.int32(total), wmat))
    probs_m = _assemble_band_blocks(blocks, h, w, p, total)

    np.testing.assert_allclose(np.asarray(probs_m), np.asarray(probs_g),
                               rtol=1e-5, atol=1e-5)


def test_sharded_train_step_matches_single_device(synthetic_scene_module):
    """VERDICT r2 #7: same batch, same params — the 8-device DP-sharded
    train step must match the single-device step.

    Compared strictly: per-step losses, ALL updated params + BatchNorm
    running stats, and post-step eval logits on a probe batch. The test
    pins SGD: under Adam, conv biases feeding BatchNorm (gradient
    mathematically zero — BN subtracts the mean) turn reduction-order fp
    noise into full +-lr steps, so ANY two reduction orders diverge on
    those dead params by construction (verified 2026-08-17: losses agree
    to 1e-6 while dead biases differ by 2*lr). SGD scales the noise by lr
    instead of normalizing it to 1, keeping every leaf comparable at tight
    tolerance — which is the actual DP-sharding guard this test is for."""
    import jax
    import jax.numpy as jnp

    from vit_cnn_tpu.parallel import make_mesh, shard_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs multi-device (virtual CPU mesh)")

    img1, img2, gt = synthetic_scene_module
    np.random.seed(0)
    train_gt, _ = sample_gt(gt, 0.5, mode="random", seed=0)
    batch = 32
    hp = {
        "n_classes": 5, "n_bands": (img1.shape[-1], 1),
        "ignored_labels": [0], "dataset": "Synthetic",
        "patch_size": 7, "epoch": 1, "batch_size": batch,
    }
    module, spec, hp = get_model("Middle_fusion_CNN", **hp)
    hp["optimizer"] = "sgd"          # see docstring: well-conditioned guard
    pipe = PatchPipeline(img1, img2, train_gt, hp["patch_size"],
                         hp["ignored_labels"], hp["n_classes"])

    mesh = make_mesh(8)
    tr_mesh = Trainer(module, hp, pipe, mesh=mesh, save_checkpoints=False)
    tr_one = Trainer(module, hp, pipe, mesh=None, save_checkpoints=False)

    order = pipe.epoch_order(np.random.RandomState(0))[:batch]
    sel = np.ascontiguousarray(order)
    ones = np.ones(batch, np.float32)
    for s in range(2):
        rng_step = jax.random.PRNGKey(42 + s)
        tr_mesh.state, lm = tr_mesh._step(
            tr_mesh.state, shard_batch(sel, mesh), shard_batch(ones, mesh),
            rng_step, tr_mesh._arrays, jnp.float32(0.0))
        tr_one.state, lo = tr_one._step(
            tr_one.state, jnp.asarray(sel), jnp.asarray(ones), rng_step,
            tr_one._arrays, jnp.float32(0.0))
        np.testing.assert_allclose(float(lm), float(lo), rtol=1e-5,
                                   atol=1e-6)

    # every leaf of the updated state (params + running stats) agrees
    got = jax.device_get(tr_mesh.state.variables)
    want = jax.device_get(tr_one.state.variables)
    flat_g, _ = jax.tree_util.tree_flatten_with_path(got)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(want)
    for (path, g), (_, w) in zip(flat_g, flat_w):
        np.testing.assert_allclose(
            g, w, rtol=1e-4, atol=1e-6,
            err_msg=f"state diverged under DP sharding: {path}")

    # functional equivalence after 2 DP steps: eval logits agree
    key = jax.random.PRNGKey(7)
    p1, p2, labels = jax.jit(pipe.make_batch, static_argnames=("train",))(
        key, jnp.asarray(sel), train=False, arrays=tr_one._arrays)
    logit_fn = jax.jit(partial(module.apply, train=False))
    lg_m = np.asarray(logit_fn(got, p1, p2))
    lg_o = np.asarray(logit_fn(want, p1, p2))
    np.testing.assert_allclose(lg_m, lg_o, rtol=1e-4, atol=1e-5)


def test_scene_cache_identity_eviction_and_reuse(trained):
    """Device-resident scene cache: repeat serving of the SAME host arrays
    reuses the uploaded buffers (no re-upload) and is bit-identical; a
    fresh array object misses; entries evict when the host array dies."""
    import gc

    from vit_cnn_tpu.infer import fullscene

    module, best, trainer, hp, (img1, img2, gt, test_gt) = trained
    fullscene._scene_cache.clear()

    p1 = full_scene_probabilities(module, best, img1, img2, hp, chunk=512)
    d1 = fullscene._device_scene(img1, bool(hp.get("bf16")))
    p2 = full_scene_probabilities(module, best, img1, img2, hp, chunk=512)
    d2 = fullscene._device_scene(img1, bool(hp.get("bf16")))
    assert d1 is d2, "second call must reuse the cached device scene"
    np.testing.assert_array_equal(p1, p2)

    fresh = img1.copy()
    d3 = fullscene._device_scene(fresh, bool(hp.get("bf16")))
    assert d3 is not d1
    p3 = full_scene_probabilities(module, best, fresh, img2, hp, chunk=512)
    np.testing.assert_array_equal(p1, p3)

    # eviction: assert via the bf16 variant — its host-side astype COPIES,
    # so the device array cannot alias (and thus retain) the host array.
    # The f32 variant on CPU backends zero-copy aliases the numpy buffer,
    # which legitimately keeps the entry alive as long as the device
    # array lives (on TPU every upload copies, so f32 evicts too).
    fresh2 = img1.copy()
    d4 = fullscene._device_scene(fresh2, True)
    assert d4.dtype == __import__("jax").numpy.bfloat16
    n_before = len(fullscene._scene_cache)
    del fresh2, d4
    gc.collect()
    assert len(fullscene._scene_cache) < n_before, \
        "dropping the host array must evict its cache entry"


def test_device_out_matches_host_out(trained):
    """out="device" (bench.py steady-state path) returns the same map as
    the default host fetch, as a device array."""
    import jax

    module, best, trainer, hp, (img1, img2, gt, test_gt) = trained
    ph = full_scene_probabilities(module, best, img1, img2, hp, chunk=512)
    pd = full_scene_probabilities(module, best, img1, img2, hp, chunk=512,
                                  out="device")
    assert isinstance(pd, jax.Array)
    np.testing.assert_array_equal(ph, np.asarray(pd))
