"""Patch pipeline geometry + augmentation tests
(semantics of ref: datasets.py:461-593)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cnn_tpu.pipeline import (AugmentConfig, PatchPipeline,
                                  gather_patches, interior_indices)


def test_interior_indices_strict_bounds():
    gt = np.ones((10, 12), dtype=np.int64)
    idx = interior_indices(gt, patch_size=5, ignored_labels=[0])
    # p = 2: x > 2 and x < 8 -> rows 3..7; cols 3..9
    assert idx[:, 0].min() == 3 and idx[:, 0].max() == 7
    assert idx[:, 1].min() == 3 and idx[:, 1].max() == 9


def test_interior_indices_filters_ignored():
    gt = np.zeros((9, 9), dtype=np.int64)
    gt[4, 4] = 2
    idx = interior_indices(gt, patch_size=3, ignored_labels=[0])
    assert idx.tolist() == [[4, 4]]


def test_gather_patches_matches_numpy(synthetic_scene):
    img1, img2, gt = synthetic_scene
    centers = np.array([[5, 6], [10, 20], [30, 12]], dtype=np.int32)
    p = 5
    patches = np.asarray(gather_patches(jnp.asarray(img1), jnp.asarray(centers), p))
    for k, (x, y) in enumerate(centers):
        ref = img1[x - 2:x + 3, y - 2:y + 3]
        np.testing.assert_allclose(patches[k], ref, rtol=1e-6)


def test_pipeline_batch_shapes_and_labels(synthetic_scene):
    img1, img2, gt = synthetic_scene
    pipe = PatchPipeline(img1, img2, gt, patch_size=7, ignored_labels=[0],
                         n_classes=5)
    key = jax.random.PRNGKey(0)
    centers = jnp.asarray(pipe.indices[:16])
    p1, p2, labels = pipe.make_batch(key, centers, train=False)
    assert p1.shape == (16, 7, 7, img1.shape[-1])
    assert p2.shape == (16, 7, 7, 1)
    expect = gt[pipe.indices[:16, 0], pipe.indices[:16, 1]]
    np.testing.assert_array_equal(np.asarray(labels), expect)


def test_flip_augmentation_preserves_center_label_odd_patch(synthetic_scene):
    img1, img2, gt = synthetic_scene
    pipe = PatchPipeline(img1, img2, gt, patch_size=7, ignored_labels=[0],
                         n_classes=5, augment=AugmentConfig(flip=True))
    centers = jnp.asarray(pipe.indices[:32])
    expect = gt[pipe.indices[:32, 0], pipe.indices[:32, 1]]
    for s in range(3):
        _, _, labels = pipe.make_batch(jax.random.PRNGKey(s), centers,
                                       train=True)
        # odd patch: center survives every flip/rot
        np.testing.assert_array_equal(np.asarray(labels), expect)


def test_flip_augmentation_changes_data(synthetic_scene):
    img1, img2, gt = synthetic_scene
    pipe = PatchPipeline(img1, img2, gt, patch_size=7, ignored_labels=[0],
                         n_classes=5, augment=AugmentConfig(flip=True))
    centers = jnp.asarray(pipe.indices[:32])
    base, _, _ = pipe.make_batch(jax.random.PRNGKey(0), centers, train=False)
    aug, _, _ = pipe.make_batch(jax.random.PRNGKey(0), centers, train=True)
    assert not np.allclose(np.asarray(base), np.asarray(aug))
    # flips/rot preserve the multiset of values per patch
    np.testing.assert_allclose(np.sort(np.asarray(base), axis=None),
                               np.sort(np.asarray(aug), axis=None), rtol=1e-6)


def test_radiation_augmentation_statistics(synthetic_scene):
    img1, img2, gt = synthetic_scene
    pipe = PatchPipeline(img1, img2, gt, patch_size=5, ignored_labels=[0],
                         n_classes=5, augment=AugmentConfig(radiation=True))
    centers = jnp.asarray(pipe.indices[:200])
    base, _, _ = pipe.make_batch(jax.random.PRNGKey(1), centers, train=False)
    aug, _, _ = pipe.make_batch(jax.random.PRNGKey(1), centers, train=True)
    changed = np.any(np.asarray(base) != np.asarray(aug), axis=(1, 2, 3))
    # gate fires with p=0.1 per sample
    assert 0.02 < changed.mean() < 0.3


def test_mixture_augmentation_runs(synthetic_scene):
    img1, img2, gt = synthetic_scene
    pipe = PatchPipeline(img1, img2, gt, patch_size=5, ignored_labels=[0],
                         n_classes=5, augment=AugmentConfig(mixture=True))
    centers = jnp.asarray(pipe.indices[:64])
    aug, _, labels = pipe.make_batch(jax.random.PRNGKey(2), centers,
                                     train=True)
    assert np.isfinite(np.asarray(aug)).all()


def test_even_patch_center_label_follows_flip(synthetic_scene):
    """For even patches the reference extracts the center AFTER augmentation,
    so the label can change under flips — our pipeline must reproduce that."""
    img1, img2, gt = synthetic_scene
    pipe = PatchPipeline(img1, img2, gt, patch_size=8, ignored_labels=[0],
                         n_classes=5, augment=AugmentConfig(flip=True))
    centers = jnp.asarray(pipe.indices[:64])
    flipped_any = False
    base = gt[pipe.indices[:64, 0], pipe.indices[:64, 1]]
    for s in range(5):
        _, _, labels = pipe.make_batch(jax.random.PRNGKey(s), centers,
                                       train=True)
        if not np.array_equal(np.asarray(labels), base):
            flipped_any = True
    assert flipped_any


def test_geom_offset_grids_match_geom_apply(synthetic_scene):
    """Folding flip/rotate into the gather (offset grids) must equal
    gathering then _geom_apply, for every code and odd AND even patch."""
    import jax.numpy as jnp

    from vit_cnn_tpu.pipeline.patches import (_geom_apply,
                                              _geom_offset_grids,
                                              gather_patches)

    img1, img2, gt = synthetic_scene
    scene = jnp.asarray(img1)
    for p in (9, 8):
        centers = jnp.asarray(
            np.array([[p, p], [p + 3, p + 2], [12, 13]], np.int32))
        base = gather_patches(scene, centers, p)
        gr, gc = _geom_offset_grids(p)
        for code in range(7):
            want = np.stack([np.asarray(_geom_apply(b, jnp.int32(code)))
                             for b in base])
            codes = jnp.full((centers.shape[0],), code, jnp.int32)
            got = gather_patches(scene, centers, p,
                                 (gr[codes], gc[codes]))
            np.testing.assert_array_equal(want, np.asarray(got), err_msg=(
                f"patch {p} code {code}"))
