"""Two-view contrastive pipeline — TPU-native MultiModalX_all.

Replaces the reference's per-sample CPU Dataset (ref: datasets.py:596-735)
with a jitted batched gather: view 1 is the raw patch, view 2 is the
augmented patch (flip-or-rotate, then radiation noise with p=0.1, mixture
noise with p=0.2 — same probabilities and order as
ref: datasets.py:699-707). Centers cover ALL interior pixels, including
ignored labels (the reference comments the ignored-label mask out for
pretraining, ref: datasets.py:624-628).

Note: when ``flip_augmentation`` is off, the reference's __getitem__
crashes on undefined ``data1_2`` (ref: datasets.py:698-707) — pretraining
there *requires* geometric augmentation. Here view 2 degrades to a copy of
view 1 instead (documented in QUIRKS.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .patches import (AugmentConfig, PatchPipeline, _geom_apply,
                      gather_patches, mixture_noise, radiation_noise,
                      sample_geom_code)


class TwoViewPipeline(PatchPipeline):
    """Yields (x1_v1, x1_v2, x2_v1, x2_v2, label) batches for contrastive
    pretraining, the 5-tuple of ref: datasets.py:731-735."""

    def __init__(self, img1, img2, gt, patch_size, ignored_labels, n_classes,
                 augment: AugmentConfig = AugmentConfig(flip=True)):
        # supervision="semi" keeps every interior pixel (mask of ones) —
        # identical to the commented-out ignored-label filter in the
        # reference's "full" path (ref: datasets.py:624-632).
        super().__init__(img1, img2, gt, patch_size, ignored_labels,
                         n_classes, augment=augment, supervision="semi")
        if augment.mixture and self.class_table is None:
            raise ValueError("mixture augmentation needs a class table")

    def make_views(self, key: jax.Array, centers: jnp.ndarray,
                   arrays=None):
        """Gather + build the two views for one batch. Call inside jit;
        pass ``arrays=device_arrays()`` so the scene rasters stay runtime
        arguments (see PatchPipeline.device_arrays)."""
        a = arrays if arrays is not None else self.device_arrays()
        p = self.patch_size
        cfg = self.augment_cfg
        v1_1 = gather_patches(a["scene1"], centers, p)
        v2_1 = gather_patches(a["scene2"], centers, p)
        lp = gather_patches(a["gt"][..., None], centers, p)[..., 0]

        b = v1_1.shape[0]
        keys = jax.random.split(key, b)

        def one(k, d1, d2, lab):
            k_geo, k_rg, k_r, k_mg, k_m = jax.random.split(k, 5)
            d1a, d2a, laba = d1, d2, lab
            if cfg.flip and p > 1:
                code = sample_geom_code(k_geo)
                d1a = _geom_apply(d1, code)
                d2a = _geom_apply(d2, code)
                laba = _geom_apply(lab, code)
            if cfg.radiation:
                gate = jax.random.uniform(k_rg) < 0.1
                d1a = jnp.where(gate, radiation_noise(k_r, d1a), d1a)
            if cfg.mixture:
                gate = jax.random.uniform(k_mg) < 0.2
                mixed = mixture_noise(k_m, d1a, laba, a["scene1"],
                                      self.class_table, self.class_counts,
                                      self.ignored_mask)
                d1a = jnp.where(gate, mixed, d1a)
            return d1a, d2a

        v1_2, v2_2 = jax.vmap(one)(keys, v1_1, v2_1, lp)

        if self.center_pixel and p > 1:
            labels = lp[:, p // 2, p // 2]
        else:
            labels = lp[:, 0, 0]
        return v1_1, v1_2, v2_1, v2_2, labels
