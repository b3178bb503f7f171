"""Pretrain subsystem: two-view pipeline + MoCo loop (ref:
model_utils.py:682-851, datasets.py:596-735)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cnn_tpu.models.moco import DualModalEncoder
from vit_cnn_tpu.pipeline.patches import AugmentConfig
from vit_cnn_tpu.pipeline.twoview import TwoViewPipeline
from vit_cnn_tpu.train.pretrain import Pretrainer, adjust_learning_rate


def test_twoview_covers_all_interior_pixels(synthetic_scene):
    img1, img2, gt = synthetic_scene
    p = 5
    pipe = TwoViewPipeline(img1, img2, gt, p, [0], 5)
    h, w = gt.shape
    # ALL interior pixels, ignored labels included (ref: datasets.py:624-632)
    half = p // 2
    expected = sum(1 for x in range(h) for y in range(w)
                   if x > half and x < h - half and y > half and y < w - half)
    assert len(pipe) == expected


def test_twoview_view1_is_raw_view2_augmented(synthetic_scene):
    img1, img2, gt = synthetic_scene
    p = 5
    pipe = TwoViewPipeline(img1, img2, gt, p, [0], 5,
                           augment=AugmentConfig(flip=True, radiation=True))
    centers = jnp.asarray(pipe.indices[:8])
    v1_1, v1_2, v2_1, v2_2, labels = jax.jit(pipe.make_views)(
        jax.random.PRNGKey(3), centers)
    # view 1 must equal a direct gather (no augmentation)
    c = np.asarray(centers)
    for i in range(4):
        x, y = c[i]
        ref = img1[x - p // 2:x + p // 2 + 1, y - p // 2:y + p // 2 + 1]
        np.testing.assert_allclose(np.asarray(v1_1[i]), ref, rtol=1e-6)
    # view 2 differs for at least some samples (geom or radiation applied)
    assert not np.allclose(np.asarray(v1_1), np.asarray(v1_2))
    assert v2_1.shape == v2_2.shape == (8, p, p, img2.shape[-1])
    assert labels.shape == (8,)


def test_adjust_learning_rate_parity():
    # cosine (ref: utils.py:24-25)
    hp = {"cos": True, "epoch": 100}
    assert adjust_learning_rate(1.0, 0, hp) == pytest.approx(1.0)
    assert adjust_learning_rate(1.0, 50, hp) == pytest.approx(0.5)
    # stepwise (ref: utils.py:26-28)
    hp = {"cos": False, "schedule_milestones": [10, 20], "epoch": 100}
    assert adjust_learning_rate(1.0, 5, hp) == pytest.approx(1.0)
    assert adjust_learning_rate(1.0, 15, hp) == pytest.approx(0.1)
    assert adjust_learning_rate(1.0, 25, hp) == pytest.approx(0.01)


def test_moco_pretrain_reduces_loss(synthetic_scene):
    img1, img2, gt = synthetic_scene
    hp = {"batch_size": 32, "epoch": 3, "lr": 1e-3, "cos": True,
          "dataset": "Synthetic"}
    pipe = TwoViewPipeline(img1, img2, gt, 5, [0], 5,
                           augment=AugmentConfig(flip=True))
    enc = DualModalEncoder(embed_dim=32)
    pre = Pretrainer(enc, hp, pipe, queue_size=64, embed_dim=32,
                     save_checkpoints=False)
    best = pre.fit(run=0, dataset_name="Synthetic")
    assert len(pre.losses) == 3
    assert np.isfinite(pre.losses).all()
    # contrastive loss should move (training is happening)
    assert pre.losses[-1] < pre.losses[0]
    assert "params" in best


def test_moco_queue_rolls(synthetic_scene):
    img1, img2, gt = synthetic_scene
    hp = {"batch_size": 16, "epoch": 1, "lr": 1e-3, "cos": False,
          "dataset": "Synthetic"}
    pipe = TwoViewPipeline(img1, img2, gt, 5, [0], 5,
                           augment=AugmentConfig(flip=True))
    enc = DualModalEncoder(embed_dim=16)
    pre = Pretrainer(enc, hp, pipe, queue_size=32, embed_dim=16,
                     save_checkpoints=False)
    q0 = np.asarray(pre.moco.queue)
    pre.fit(run=0, dataset_name="Synthetic")
    q1 = np.asarray(pre.moco.queue)
    assert not np.allclose(q0, q1)  # negatives were enqueued
    # queue stays L2-normalized
    np.testing.assert_allclose(np.linalg.norm(q1, axis=1), 1.0, atol=1e-3)
