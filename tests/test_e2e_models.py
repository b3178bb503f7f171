"""End-to-end micro-train + full-scene inference for representative model
families beyond EndNet (SURVEY.md §4): the Mamba flagship, a patch-1
transformer (SpectralFormer), and the PCA path (HCTnet)."""

import os

import numpy as np
import pytest

from vit_cnn_tpu.data.registry import _synthetic_loader
from vit_cnn_tpu.data.sampling import sample_gt
from vit_cnn_tpu.infer import full_scene_probabilities
from vit_cnn_tpu.models import get_model
from vit_cnn_tpu.pipeline import AugmentConfig, PatchPipeline


@pytest.fixture(scope="module")
def scene():
    os.environ.update(VCT_SYN_H="32", VCT_SYN_W="28", VCT_SYN_BANDS="32",
                      VCT_SYN_CLASSES="5")
    try:
        return _synthetic_loader("")
    finally:
        for k in ("VCT_SYN_H", "VCT_SYN_W", "VCT_SYN_BANDS",
                  "VCT_SYN_CLASSES"):
            os.environ.pop(k, None)


@pytest.mark.parametrize("name", ["Multimodality_Mamba", "SpectralFormer",
                                  "HCTnet"])
def test_micro_train_and_fullscene(name, scene):
    from vit_cnn_tpu.train import Trainer

    img1, img2, gt = scene
    train_gt, _ = sample_gt(gt, 0.4, mode="random", seed=0)
    hp = {"n_classes": 5, "n_bands": (img1.shape[-1], 1),
          "ignored_labels": [0], "dataset": "Synthetic", "epoch": 2,
          "batch_size": 16, "test_stride": 3}
    module, spec, hp = get_model(name, **hp)

    img1_model = img1
    if hp["applyPCA"]:
        from vit_cnn_tpu.data.normalize import apply_pca

        # HCTnet's registry default is 30 components (QUIRKS.md #4)
        assert hp["pca_components"] == 30
        img1_model = apply_pca(img1, hp["pca_components"])

    pipe = PatchPipeline(img1_model, img2, train_gt, hp["patch_size"],
                         hp["ignored_labels"], hp["n_classes"],
                         augment=AugmentConfig(flip=True))
    trainer = Trainer(module, hp, pipe, seed=0, save_checkpoints=False)
    best = trainer.fit(run=0, dataset_name="Synthetic")
    assert np.isfinite(trainer.log.losses).all()
    assert trainer.log.losses[-1] < trainer.log.losses[0] * 1.5  # not diverging

    probs = full_scene_probabilities(module, best, img1, img2, hp, chunk=128)
    assert probs.shape == (img1.shape[0], img1.shape[1], 5)
    assert np.isfinite(probs).all()
    assert np.abs(probs).sum() > 0
