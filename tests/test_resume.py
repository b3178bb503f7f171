"""Resumable training: full train state + host RNG round-trip
(SURVEY.md §5 "failure detection / elastic recovery")."""

import numpy as np

from vit_cnn_tpu.models import get_model
from vit_cnn_tpu.pipeline import AugmentConfig, PatchPipeline
from vit_cnn_tpu.train import Trainer


def _trainer(synthetic_scene, seed=0, epochs=4):
    img1, img2, gt = synthetic_scene
    hp = {"n_classes": 5, "n_bands": (img1.shape[-1], 1),
          "ignored_labels": [0], "dataset": "Synthetic", "epoch": epochs,
          "batch_size": 32, "patch_size": 5, "sampling_mode": "random"}
    module, spec, hp = get_model("Early_fusion_CNN", **hp)
    hp["patch_size"] = 5        # small patch for test speed
    pipe = PatchPipeline(img1, img2, gt, 5, [0], 5,
                         augment=AugmentConfig(flip=True))
    return Trainer(module, hp, pipe, seed=seed, save_checkpoints=False), hp


def test_resume_reproduces_unbroken_run(synthetic_scene, tmp_path):
    # Run A: 4 epochs straight through
    tr_a, _ = _trainer(synthetic_scene)
    tr_a.fit(run=0, dataset_name="Synthetic")
    losses_a = list(tr_a.log.losses)

    # Run B: 2 epochs, checkpoint, fresh trainer, restore, 2 more epochs
    tr_b, _ = _trainer(synthetic_scene)
    tr_b.epochs = 2
    tr_b.fit(run=0, dataset_name="Synthetic")
    path = tr_b.save_resumable(str(tmp_path / "ckpt"), epoch=2)

    tr_c, _ = _trainer(synthetic_scene, seed=123)   # different seed on purpose
    start = tr_c.restore_resumable(path)
    assert start == 2
    tr_c.epochs = 4
    tr_c.fit(run=0, dataset_name="Synthetic", start_epoch=start)
    losses_c = list(tr_c.log.losses)

    # epochs 3-4 of the resumed run must match the unbroken run exactly
    # (same shuffle order, same augmentation stream, same opt state)
    np.testing.assert_allclose(losses_c, losses_a[2:], rtol=1e-5)


def test_restore_roundtrip_preserves_step(synthetic_scene, tmp_path):
    tr, _ = _trainer(synthetic_scene, epochs=1)
    tr.fit(run=0, dataset_name="Synthetic")
    step_before = int(tr.state.step)
    assert step_before > 0
    path = tr.save_resumable(str(tmp_path / "ck2"), epoch=1)
    tr2, _ = _trainer(synthetic_scene, seed=7, epochs=1)
    tr2.restore_resumable(path)
    assert int(tr2.state.step) == step_before
    # params equal leaf-wise
    import jax

    for l1, l2 in zip(jax.tree_util.tree_leaves(tr.state.params),
                      jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
