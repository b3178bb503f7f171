"""bf16 training policy: f32 master state, bf16 compute, loss decreases."""

import jax.numpy as jnp
import numpy as np

from vit_cnn_tpu.models import get_model
from vit_cnn_tpu.pipeline import PatchPipeline
from vit_cnn_tpu.train import Trainer


def test_bf16_training_step(synthetic_scene):
    import jax

    img1, img2, gt = synthetic_scene
    hp = {"n_classes": 5, "n_bands": (img1.shape[-1], 1),
          "ignored_labels": [0], "dataset": "Synthetic", "epoch": 3,
          "batch_size": 32, "bf16": True}
    module, spec, hp = get_model("Early_fusion_CNN", **hp)
    hp["patch_size"] = 7
    pipe = PatchPipeline(img1, img2, gt, 7, [0], 5)
    tr = Trainer(module, hp, pipe, save_checkpoints=False)
    tr.fit(run=0, dataset_name="Synthetic")
    assert np.isfinite(tr.log.losses).all()
    assert tr.log.losses[-1] < tr.log.losses[0]
    # master params and batch stats stay f32
    for leaf in jax.tree_util.tree_leaves(tr.state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(tr.state.batch_stats):
        assert leaf.dtype == jnp.float32
