"""Dataset loader round-trips: synthesize the .mat layout every registry
entry expects (keys, nesting, dtypes — ref: datasets.py:76-458), load it
through get_dataset, and check normalization/NaN/shape contracts."""

import os

import numpy as np
import pytest
import scipy.io

from vit_cnn_tpu.data.registry import DATASETS, get_dataset

H, W, BANDS = 13, 11, 6


def _write_simple(spec, folder):
    rng = np.random.RandomState(0)
    os.makedirs(folder, exist_ok=True)
    hsi = rng.rand(H, W, BANDS).astype(np.float32) * 100
    hsi[0, 0, 0] = np.nan                      # exercise NaN filtering
    lidar = rng.rand(H + 2, W + 1).astype(np.float32) * 50   # larger co-raster
    n_cls = len(spec.label_values)
    gt = rng.randint(0, n_cls, size=(H, W)).astype(np.uint8)

    fn, key = spec.hsi_file
    scipy.io.savemat(os.path.join(folder, fn), {key: hsi})
    fn, key = spec.lidar_file
    scipy.io.savemat(os.path.join(folder, fn), {key: lidar})
    fn, key = spec.gt_file
    scipy.io.savemat(os.path.join(folder, fn), {key: gt})
    return gt


def _write_muufl(folder):
    """MUUFL's single nested MATLAB struct (ref: datasets.py:309-319)."""
    rng = np.random.RandomState(1)
    os.makedirs(folder, exist_ok=True)
    data = rng.rand(H, W, BANDS).astype(np.float32)
    z = rng.rand(H, W, 2).astype(np.float32)
    labels = rng.randint(-1, 11, size=(H, W)).astype(np.int16)
    # scipy maps nested dtype-object arrays to MATLAB structs
    lidar_inner = np.zeros((1, 1), dtype=[("z", object)])
    lidar_inner[0, 0]["z"] = np.empty((1, 1), object)
    lidar_inner[0, 0]["z"][0, 0] = z
    scene = np.zeros((1, 1), dtype=[("labels", object)])
    scene[0, 0]["labels"] = labels
    hsi = {"hsi": {"Data": data, "Lidar": lidar_inner,
                   "sceneLabels": scene}}
    scipy.io.savemat(os.path.join(folder, "muufl.mat"), hsi)
    return labels


SIMPLE = [n for n, s in DATASETS.items() if s.loader is None]


@pytest.mark.parametrize("name", SIMPLE)
def test_simple_loader_roundtrip(name, tmp_path):
    spec = DATASETS[name]
    gt_written = _write_simple(spec, str(tmp_path / name))
    (img1, img2, gt, label_values, ignored, rgb_bands,
     palette) = get_dataset(name, str(tmp_path))
    assert img1.shape == (H, W, BANDS)
    assert img2.shape == (H, W, 1)             # cropped to HSI footprint
    assert gt.shape == (H, W)
    # per-band [0,1] normalization (ref: datasets.py per-dataset minmax)
    assert np.nanmax(img1) <= 1.0 + 1e-6 and np.nanmin(img1) >= -1e-6
    assert img2.max() <= 1.0 + 1e-6 and img2.min() >= -1e-6
    assert not np.isnan(img1).any()            # NaN filtered
    # the NaN pixel's gt must be zeroed, others preserved
    assert gt[0, 0] == 0
    assert (gt[1:] == gt_written[1:]).all()
    assert label_values == list(spec.label_values)
    assert 0 in ignored


def test_muufl_nested_struct(tmp_path):
    labels = _write_muufl(str(tmp_path / "MUUFL"))
    (img1, img2, gt, label_values, ignored, rgb_bands,
     palette) = get_dataset("MUUFL", str(tmp_path))
    assert img1.shape == (H, W, BANDS)
    assert img2.shape == (H, W, 1)             # first z layer only
    # -1 labels mapped to 0 (ref: datasets.py:318)
    assert gt.min() >= 0
    assert (gt[labels == -1] == 0).all()
    assert len(label_values) == 12


def test_unknown_dataset_raises():
    with pytest.raises(ValueError, match="unknown"):
        get_dataset("Nope", "/tmp")
