"""bf16 compute policy (nn/precision.py)."""

import jax.numpy as jnp
import numpy as np

from vit_cnn_tpu.nn.precision import bf16_apply, cast_floating


def test_cast_floating_skips_ints():
    tree = {"a": jnp.ones(3, jnp.float32), "b": jnp.ones(3, jnp.int32)}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32


def test_bf16_fullscene_close_to_f32(synthetic_scene):
    import jax

    from vit_cnn_tpu.infer.fullscene import full_scene_probabilities
    from vit_cnn_tpu.models import get_model

    img1, img2, gt = synthetic_scene
    hp = {"n_classes": 5, "n_bands": (img1.shape[-1], 1),
          "ignored_labels": [0], "patch_size": 7, "test_stride": 3}
    module, spec, hp = get_model("Early_fusion_CNN", **hp)
    key = jax.random.PRNGKey(0)
    d1 = jnp.zeros((2, 7, 7, img1.shape[-1]), jnp.float32)
    d2 = jnp.zeros((2, 7, 7, 1), jnp.float32)
    variables = module.init({"params": key, "dropout": key}, d1, d2,
                            train=False)

    p32 = full_scene_probabilities(module, variables, img1, img2,
                                   dict(hp), chunk=256)
    p16 = full_scene_probabilities(module, variables, img1, img2,
                                   dict(hp, bf16=True), chunk=256)
    assert p16.dtype == np.float32
    # predictions must agree almost everywhere; scores within bf16 tolerance
    touched = np.abs(p32).sum(-1) > 0
    agree = (p32.argmax(-1) == p16.argmax(-1))[touched].mean()
    assert agree > 0.97, agree
    np.testing.assert_allclose(p16[touched], p32[touched], atol=0.15,
                               rtol=0.1)
