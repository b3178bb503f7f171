"""TPU-native patch pipeline.

Replaces the reference's per-sample Python ``Dataset.__getitem__``
(ref: datasets.py:461-593) with batched, jit-compiled device gathers:

* the scene rasters live in HBM once,
* a batch of (row, col) centers turns into (B, P, P, C) patches via a
  vmapped ``lax.dynamic_slice``,
* augmentations (flip/rot90, radiation noise, mixture noise — semantics of
  ref: datasets.py:510-545) are fused into the same jitted program with
  explicit jax.random keys,
* the center label is extracted *after* augmentation, matching the
  reference's order (which matters for even patch sizes).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Index selection (host side, cheap)
# ---------------------------------------------------------------------------

def interior_indices(gt: np.ndarray, patch_size: int,
                     ignored_labels: Sequence[int],
                     supervision: str = "full",
                     include_ignored: bool = False) -> np.ndarray:
    """(N, 2) array of labeled pixel centers strictly inside the border.

    Matches ref: datasets.py:489-504: pixels with non-ignored labels
    (all pixels for 'semi' supervision or include_ignored=True), restricted
    to ``x > p and x < H - p`` with p = patch_size // 2 (strict on both
    sides, exactly as the reference).
    """
    if supervision == "semi" or include_ignored:
        mask = np.ones_like(gt)
    else:
        mask = np.ones_like(gt)
        for l in set(ignored_labels):
            mask[gt == l] = 0
    x_pos, y_pos = np.nonzero(mask)
    p = patch_size // 2
    h, w = gt.shape
    keep = (x_pos > p) & (x_pos < h - p) & (y_pos > p) & (y_pos < w - p)
    return np.stack([x_pos[keep], y_pos[keep]], axis=1).astype(np.int32)


def build_class_index_table(gt: np.ndarray, indices: np.ndarray,
                            n_classes: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-class table of training centers, padded to the max class count.

    Used by mixture augmentation to sample a same-class spectrum
    (ref: datasets.py:534-545). Returns (table[n_classes, M, 2], counts).
    Empty classes get count 0 and point at row (0, 0).
    """
    labels = gt[indices[:, 0], indices[:, 1]]
    counts = np.zeros(n_classes, dtype=np.int32)
    for c in range(n_classes):
        counts[c] = int(np.sum(labels == c))
    m = max(int(counts.max()), 1)
    table = np.zeros((n_classes, m, 2), dtype=np.int32)
    for c in range(n_classes):
        rows = indices[labels == c]
        if len(rows):
            table[c, : len(rows)] = rows
    return table, counts


# ---------------------------------------------------------------------------
# Device-side gather + augmentation (all jit-able)
# ---------------------------------------------------------------------------

def gather_patches(img: jnp.ndarray, centers: jnp.ndarray,
                   patch_size: int,
                   offsets: Optional[Tuple[jnp.ndarray,
                                           jnp.ndarray]] = None
                   ) -> jnp.ndarray:
    """Gather (B, P, P, C) patches around (B, 2) centers from an (H, W, C)
    scene. Centers must be valid interior pixels (no clamping surprises).

    One advanced-indexing gather HLO (C-contiguous rows) — 2.1x faster on
    TPU than a vmapped ``lax.dynamic_slice`` (perf/gather_sweep.py).
    Index grids are clamped to the scene so a non-interior center degrades
    to edge replication (like the dynamic_slice this replaced) instead of
    silently wrapping to the opposite edge; current callers only pass
    interior centers (interior_indices) so the clamp is a no-op for them.

    ``offsets`` (optional): per-sample (B, P, P) row/col offset grids —
    folds per-sample flip/rotate augmentation into the gather itself
    (see ``_geom_offset_grids``)."""
    p = patch_size // 2
    if offsets is None:
        di = jnp.arange(patch_size) - p
        r = centers[:, 0, None, None] + di[None, :, None]
        c = centers[:, 1, None, None] + di[None, None, :]
    else:
        r = centers[:, 0, None, None] + offsets[0]
        c = centers[:, 1, None, None] + offsets[1]
    r = jnp.clip(r, 0, img.shape[0] - 1)
    c = jnp.clip(c, 0, img.shape[1] - 1)
    return img[r, c]


def _geom_apply(arr: jnp.ndarray, code: jnp.ndarray) -> jnp.ndarray:
    """Apply one of 7 area-preserving transforms to a (P, P, ...) patch.

    code: 0 identity, 1 fliplr, 2 flipud, 3 both, 4/5/6 rot90 k=1/2/3.
    """
    branches = [
        lambda a: a,
        lambda a: jnp.flip(a, axis=1),
        lambda a: jnp.flip(a, axis=0),
        lambda a: jnp.flip(jnp.flip(a, axis=0), axis=1),
        lambda a: jnp.rot90(a, k=1, axes=(0, 1)),
        lambda a: jnp.rot90(a, k=2, axes=(0, 1)),
        lambda a: jnp.rot90(a, k=3, axes=(0, 1)),
    ]
    return jax.lax.switch(code, branches, arr)


@lru_cache(maxsize=None)
def _geom_offset_grids(patch_size: int):
    """(7, P, P) row/col offset grids such that gathering with grid k
    equals ``_geom_apply(identity_gather, k)``: for any transform T,
    T(patch)[i, j] = img[center + T(grid0)[i, j]], so each grid is just T
    applied to the identity offset grid. Folding the flip/rotate into the
    gather replaces a vmapped 7-branch ``lax.switch`` (which computes all
    seven transforms of every patch and selects — 7x the HBM traffic,
    ~10 ms of the 57 ms train step at batch 1024) with one gather."""
    di = np.arange(patch_size) - patch_size // 2
    r0, c0 = np.meshgrid(di, di, indexing="ij")
    tfs = [lambda a: a,
           np.fliplr,
           np.flipud,
           lambda a: np.flipud(np.fliplr(a)),
           lambda a: np.rot90(a, k=1),
           lambda a: np.rot90(a, k=2),
           lambda a: np.rot90(a, k=3)]
    rs = np.stack([t(r0) for t in tfs]).astype(np.int32)
    cs = np.stack([t(c0) for t in tfs]).astype(np.int32)
    # numpy out, converted per use site: caching a jnp array created
    # inside a jit trace would leak tracers across traces
    return rs, cs


def sample_geom_code(key: jax.Array) -> jnp.ndarray:
    """Draw the flip/rotate decision with the reference's probabilities
    (ref: datasets.py:510-526 + 559-564):

    with p=1/2 take the flip branch (independent lr/ud coin flips),
    else the rotate branch (p=1/2 rotate by k ∈ {1,2,3}, else identity).
    """
    k_branch, k_h, k_v, k_do, k_rot = jax.random.split(key, 5)
    take_flip = jax.random.uniform(k_branch) > 0.5
    h = jax.random.uniform(k_h) > 0.5
    v = jax.random.uniform(k_v) > 0.5
    flip_code = h.astype(jnp.int32) + 2 * v.astype(jnp.int32)
    do_rot = jax.random.uniform(k_do) > 0.5
    k = jax.random.randint(k_rot, (), 1, 4)
    rot_code = jnp.where(do_rot, 3 + k, 0)
    return jnp.where(take_flip, flip_code, rot_code)


def radiation_noise(key: jax.Array, data: jnp.ndarray,
                    alpha_range=(0.9, 1.1), beta=1.0 / 25) -> jnp.ndarray:
    """alpha * data + beta * N(0, 1) (ref: datasets.py:528-532)."""
    k_a, k_n = jax.random.split(key)
    alpha = jax.random.uniform(k_a, (), minval=alpha_range[0],
                               maxval=alpha_range[1])
    noise = jax.random.normal(k_n, data.shape, dtype=data.dtype)
    return alpha * data + beta * noise


def mixture_noise(key: jax.Array, data: jnp.ndarray, label_patch: jnp.ndarray,
                  scene: jnp.ndarray, class_table: jnp.ndarray,
                  class_counts: jnp.ndarray, ignored_mask: jnp.ndarray,
                  beta=1.0 / 25) -> jnp.ndarray:
    """Blend each pixel with a random same-class training spectrum
    (ref: datasets.py:534-545).

    For every patch pixel with a non-ignored label l, picks a random
    training center of class l and substitutes that pixel's spectrum in the
    mixing partner; ignored pixels mix with zero, exactly as the reference.
    """
    k_a, k_pick, k_n = jax.random.split(key, 3)
    alpha = jax.random.uniform(k_a, (2,), minval=0.01, maxval=1.0)
    a1, a2 = alpha[0], alpha[1]

    p = label_patch.shape[0]
    flat_labels = label_patch.reshape(-1)
    cnt = class_counts[flat_labels]
    u = jax.random.uniform(k_pick, flat_labels.shape)
    pick = jnp.floor(u * jnp.maximum(cnt, 1)).astype(jnp.int32)
    rc = class_table[flat_labels, pick]            # (P*P, 2)
    partner = scene[rc[:, 0], rc[:, 1]]            # (P*P, C)
    ign = ignored_mask[flat_labels] | (cnt == 0)
    partner = jnp.where(ign[:, None], 0.0, partner)
    partner = partner.reshape(p, p, -1)

    noise = jax.random.normal(k_n, data.shape, dtype=data.dtype)
    return (a1 * data + a2 * partner) / (a1 + a2) + beta * noise


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    flip: bool = False
    radiation: bool = False
    mixture: bool = False


def augment_batch(key: jax.Array, p1: jnp.ndarray, p2: jnp.ndarray,
                  lp: jnp.ndarray, cfg: AugmentConfig, patch_size: int,
                  scene1: Optional[jnp.ndarray] = None,
                  class_table: Optional[jnp.ndarray] = None,
                  class_counts: Optional[jnp.ndarray] = None,
                  ignored_mask: Optional[jnp.ndarray] = None,
                  skip_geom: bool = False):
    """Apply the configured augmentations to one batch of patches.

    p1: (B,P,P,C1) HSI, p2: (B,P,P,C2) LiDAR, lp: (B,P,P) labels.
    Returns augmented (p1, p2, lp). ``skip_geom``: the flip/rotate was
    already folded into the gather (make_batch fast path).
    """
    if not (cfg.flip or cfg.radiation or cfg.mixture):
        return p1, p2, lp
    if skip_geom and not (cfg.radiation or cfg.mixture):
        return p1, p2, lp

    b = p1.shape[0]
    keys = jax.random.split(key, b)

    def one(k, d1, d2, lab):
        k_geo, k_rad_gate, k_rad, k_mix_gate, k_mix = jax.random.split(k, 5)
        if cfg.flip and patch_size > 1 and not skip_geom:
            code = sample_geom_code(k_geo)
            d1 = _geom_apply(d1, code)
            d2 = _geom_apply(d2, code)
            lab = _geom_apply(lab, code)
        if cfg.radiation:
            gate = jax.random.uniform(k_rad_gate) < 0.1
            d1 = jnp.where(gate, radiation_noise(k_rad, d1), d1)
        if cfg.mixture:
            gate = jax.random.uniform(k_mix_gate) < 0.2
            mixed = mixture_noise(k_mix, d1, lab, scene1, class_table,
                                  class_counts, ignored_mask)
            d1 = jnp.where(gate, mixed, d1)
        return d1, d2, lab

    return jax.vmap(one)(keys, p1, p2, lp)


# ---------------------------------------------------------------------------
# High-level pipeline object
# ---------------------------------------------------------------------------

class PatchPipeline:
    """Owns the on-device scenes and produces jit-friendly training batches.

    The heavy work (gather + augment) happens inside the caller's jitted
    train step via :meth:`make_batch_fn`; this object only manages indices
    and constants.
    """

    def __init__(self, img1: np.ndarray, img2: np.ndarray, gt: np.ndarray,
                 patch_size: int, ignored_labels: Sequence[int],
                 n_classes: int, augment: AugmentConfig = AugmentConfig(),
                 supervision: str = "full", center_pixel: bool = True):
        self.patch_size = int(patch_size)
        self.center_pixel = center_pixel
        self.augment_cfg = augment
        self.n_classes = n_classes

        self.scene1 = jnp.asarray(img1, dtype=jnp.float32)
        self.scene2 = jnp.asarray(img2, dtype=jnp.float32)
        self.gt = jnp.asarray(gt.astype(np.int32))

        self.indices = interior_indices(gt, patch_size, ignored_labels,
                                        supervision)
        ign = np.zeros(n_classes, dtype=bool)
        for l in ignored_labels:
            if 0 <= l < n_classes:
                ign[l] = True
        self.ignored_mask = jnp.asarray(ign)

        if augment.mixture:
            table, counts = build_class_index_table(gt, self.indices, n_classes)
            self.class_table = jnp.asarray(table)
            self.class_counts = jnp.asarray(counts)
        else:
            self.class_table = None
            self.class_counts = None

    def to_compute_dtype(self, dtype) -> None:
        """Re-store the gather sources in the training compute dtype.

        bf16 training casts every gathered patch to bf16 before the
        forward; casting the SCENE once instead is bit-identical (cast
        commutes with gather) and halves the per-step gather traffic —
        the largest non-backward term in the train-step decomposition
        (perf/profile_train.py). Labels stay int32."""
        self.scene1 = self.scene1.astype(dtype)
        self.scene2 = self.scene2.astype(dtype)

    def __len__(self) -> int:
        return len(self.indices)

    def labels_at(self, indices: np.ndarray) -> np.ndarray:
        gt_np = np.asarray(self.gt)
        return gt_np[indices[:, 0], indices[:, 1]]

    def epoch_order(self, rng: np.random.RandomState) -> np.ndarray:
        """Shuffled copy of the center list (DataLoader(shuffle=True))."""
        perm = rng.permutation(len(self.indices))
        return self.indices[perm]

    def device_arrays(self):
        """The large device rasters, to be passed as RUNTIME ARGUMENTS to
        jitted programs (never closed over: some backends embed closure
        constants into the shipped executable — a 383 MB Houston scene as
        an inline constant breaks remote compilation and bloats any
        compile cache)."""
        return {"scene1": self.scene1, "scene2": self.scene2, "gt": self.gt}

    def make_batch(self, key: jax.Array, centers: jnp.ndarray,
                   train: bool = True, arrays: Optional[dict] = None):
        """Gather + augment one batch. Call inside jit; pass
        ``arrays=device_arrays()`` through the jit boundary so the scene
        rasters stay runtime arguments.

        Returns (hsi_patches, lidar_patches, center_labels).
        Patch-1 pipelines still return (B,1,1,C); models squeeze.
        """
        a = arrays if arrays is not None else self.device_arrays()
        p = self.patch_size
        cfg = self.augment_cfg
        offsets = None
        fold_geom = bool(train and cfg.flip and p > 1)
        if fold_geom:
            # flip/rotate as per-sample gather index grids: one gather
            # instead of a vmapped 7-branch switch over materialized
            # patches (was ~10 ms of the 57 ms flagship train step)
            k_geo, key = jax.random.split(key)
            codes = jax.vmap(sample_geom_code)(
                jax.random.split(k_geo, centers.shape[0]))
            gr, gc = _geom_offset_grids(p)
            offsets = (jnp.asarray(gr)[codes], jnp.asarray(gc)[codes])
        p1 = gather_patches(a["scene1"], centers, p, offsets)
        p2 = gather_patches(a["scene2"], centers, p, offsets)
        lp = gather_patches(a["gt"][..., None], centers, p, offsets)[..., 0]

        if train:
            p1, p2, lp = augment_batch(
                key, p1, p2, lp, cfg, p,
                scene1=a["scene1"], class_table=self.class_table,
                class_counts=self.class_counts,
                ignored_mask=self.ignored_mask, skip_geom=fold_geom)

        if self.center_pixel and p > 1:
            labels = lp[:, p // 2, p // 2]
        else:
            labels = lp[:, 0, 0]
        return p1, p2, labels
