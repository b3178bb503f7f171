"""Normalization / dimensionality reduction for scene rasters.

Matches the reference's per-band min-max mapping to [0, 1]
(ref: datasets.py:124-133) and PCA whitening (ref: utils.py:85-93).
"""

from __future__ import annotations

import numpy as np


def minmax_per_band(img: np.ndarray) -> np.ndarray:
    """Map each band of an (H, W, C) raster to [0, 1] independently.

    Vectorized equivalent of the reference's per-band loop
    (ref: datasets.py:124-129).
    """
    img = img.astype(np.float32, copy=True)
    flat = img.reshape(-1, img.shape[-1])
    # NaN-aware extrema: the reference's plain min()/max() turn a single
    # NaN pixel into an all-NaN band, which then zeroes the ENTIRE ground
    # truth in its NaN filter (ref: datasets.py:124-129 + 441-449). Using
    # nanmin/nanmax keeps the damage local to the NaN pixels (QUIRKS.md).
    minimal = np.nanmin(flat, axis=0)
    maximal = np.nanmax(flat, axis=0)
    scale = maximal - minimal
    scale[scale == 0] = 1.0
    return (img - minimal) / scale


def minmax_global(img: np.ndarray) -> np.ndarray:
    """Map the whole raster to [0, 1] with a single min/max
    (how the reference treats single-band LiDAR, ref: datasets.py:131-133)."""
    img = img.astype(np.float32, copy=True)
    minimal = np.nanmin(img)
    maximal = np.nanmax(img)
    scale = maximal - minimal
    if scale == 0:
        scale = 1.0
    return (img - minimal) / scale


def apply_pca(img: np.ndarray, num_components: int) -> np.ndarray:
    """Per-pixel whitened PCA over bands (ref: utils.py:85-93)."""
    from sklearn.decomposition import PCA

    h, w, c = img.shape
    flat = img.reshape(-1, c)
    pca = PCA(n_components=num_components, whiten=True)
    out = pca.fit_transform(flat)
    return out.reshape(h, w, num_components).astype(np.float32)


def filter_nan(img1: np.ndarray, gt: np.ndarray) -> tuple[np.ndarray, np.ndarray, bool]:
    """Zero out NaN pixels in the HSI cube and their GT labels
    (ref: datasets.py:441-449). Returns (img1, gt, had_nan)."""
    nan_mask = np.isnan(img1.sum(axis=-1))
    had = bool(np.count_nonzero(nan_mask) > 0)
    if had:
        img1 = img1.copy()
        gt = gt.copy()
        img1[nan_mask] = 0
        gt[nan_mask] = 0
    return img1, gt, had
