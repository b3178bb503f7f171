"""Init + forward smoke tests for every registered model at its default
patch size (the reference's only checks were ad-hoc __main__ blocks;
SURVEY.md §4 demands better)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cnn_tpu.models import MODELS, get_model

# models implemented so far; grows as the zoo fills in
IMPLEMENTED = [
    "EndNet", "Early_fusion_CNN", "Middle_fusion_CNN", "Late_fusion_CNN",
    "Cross_fusion_CNN", "FusAtNet", "S2ENet", "MFT", "SpectralFormer",
    "S2EFT", "HCTnet", "MHST", "GLT_Net", "Multimodality_Mamba",
]

N_CLASSES = 6
N_BANDS = (20, 1)


def _hp(name):
    return {
        "n_classes": N_CLASSES, "n_bands": N_BANDS, "ignored_labels": [0],
        "dataset": "Synthetic",
    }


@pytest.mark.parametrize("name", IMPLEMENTED)
def test_forward_shapes(name):
    module, spec, hp = get_model(name, **_hp(name))
    p = hp["patch_size"]
    c1 = 30 if hp["applyPCA"] else N_BANDS[0]
    key = jax.random.PRNGKey(0)
    hsi = jax.random.normal(key, (4, p, p, c1))
    lidar = jax.random.normal(key, (4, p, p, N_BANDS[1]))
    # jitted init: plain flax init runs eagerly op-by-op (~40s for the
    # flagship on CPU); jitted it is one cached compile
    variables = jax.jit(module.init, static_argnames=("train",))(
        {"params": key, "dropout": key}, hsi, lidar, train=False)
    out = jax.jit(lambda v, a, b: module.apply(v, a, b, train=False))(
        variables, hsi, lidar)
    logits = out[0] if isinstance(out, tuple) else out
    assert logits.shape == (4, N_CLASSES)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", IMPLEMENTED)
def test_train_mode_updates_batch_stats(name):
    module, spec, hp = get_model(name, **_hp(name))
    p = hp["patch_size"]
    c1 = 30 if hp["applyPCA"] else N_BANDS[0]
    key = jax.random.PRNGKey(0)
    hsi = jax.random.normal(key, (4, p, p, c1))
    lidar = jax.random.normal(key, (4, p, p, N_BANDS[1]))
    variables = jax.jit(module.init, static_argnames=("train",))(
        {"params": key, "dropout": key}, hsi, lidar, train=False)
    if "batch_stats" not in variables:
        pytest.skip("model has no BatchNorm")
    out, updates = module.apply(variables, hsi, lidar, train=True,
                                mutable=["batch_stats"],
                                rngs={"dropout": key})
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(before, after))


def test_registry_defaults_match_reference():
    # spot-check the per-model defaults recorded in BASELINE.md
    cases = {
        "EndNet": (1, 1e-3, 150), "FusAtNet": (11, 1e-3, 150),
        "S2ENet": (7, 1e-3, 128), "Cross_fusion_CNN": (7, 1e-3, 150),
    }
    for name, (patch, lr, epochs) in cases.items():
        spec = MODELS[name]
        assert spec.patch_size == patch
        assert spec.lr == lr
        assert spec.epochs == epochs


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        get_model("NoSuchModel", **_hp("x"))
