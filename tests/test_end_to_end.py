"""Integration: micro-train EndNet on the synthetic scene, run full-scene
inference, check loss decreases and metrics are sane (SURVEY.md §4)."""

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
