"""Dataset registry and loaders.

Declarative, data-driven replacement for the reference's if/elif loader chain
(ref: datasets.py:24-458). Each dataset is described by a ``DatasetSpec``;
``get_dataset`` returns the same 7-tuple the reference does:
``(img1, img2, gt, label_values, ignored_labels, rgb_bands, palette)``
with img1/img2 as (H, W, C) float32 in [0, 1] and gt as (H, W) int.

A ``custom_datasets`` plugin hook mirrors ref: datasets.py:51-56. A built-in
``Synthetic`` dataset provides deterministic scenes for tests and benchmarks
without .mat files on disk.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from .io import open_file
from .normalize import filter_nan, minmax_global, minmax_per_band

LoaderFn = Callable[[str], Tuple[np.ndarray, np.ndarray, np.ndarray]]


@dataclasses.dataclass
class DatasetSpec:
    """Static description of one dataset (file names, .mat keys, classes)."""

    name: str
    label_values: List[str]
    rgb_bands: Tuple[int, int, int]
    # (filename, mat key) for each raster; ignored when `loader` is given
    hsi_file: Optional[Tuple[str, str]] = None
    lidar_file: Optional[Tuple[str, str]] = None
    gt_file: Optional[Tuple[str, str]] = None
    # per-band minmax for LiDAR instead of global (MUUFL does per-band,
    # ref: datasets.py:328-332; all others use one global min/max)
    lidar_per_band: bool = False
    ignored_labels: Tuple[int, ...] = (0,)
    loader: Optional[LoaderFn] = None  # fully custom loader(folder) -> rasters
    urls: Tuple[str, ...] = ()


def _muufl_loader(folder: str):
    """MUUFL ships one nested MATLAB struct (ref: datasets.py:309-319)."""
    mat = open_file(os.path.join(folder, "muufl.mat"))["hsi"]
    img1 = mat["Data"][0][0].astype(np.float32)
    img2 = mat["Lidar"][0, 0][0, 0]["z"][0, 0][:, :, 0].astype(np.float32)
    img2 = np.expand_dims(img2, axis=2)
    gt = mat["sceneLabels"][0][0]["labels"][0][0]
    gt = np.array(gt)
    gt[gt == -1] = 0
    return img1, img2, gt


def _synthetic_loader(folder: str):
    """Deterministic synthetic scene for tests/benchmarks (no files needed).

    Shape/band counts default to a small Houston2013-like scene and can be
    overridden with env vars VCT_SYN_{H,W,BANDS,CLASSES}.
    """
    h = int(os.environ.get("VCT_SYN_H", 64))
    w = int(os.environ.get("VCT_SYN_W", 64))
    bands = int(os.environ.get("VCT_SYN_BANDS", 144))
    n_cls = int(os.environ.get("VCT_SYN_CLASSES", 15))
    rng = np.random.RandomState(0)
    # class map: smooth blobs so classes are spatially coherent + learnable.
    # n_cls counts label 0 ("Unclassified"), so real classes are 1..n_cls-1.
    yy, xx = np.mgrid[0:h, 0:w]
    n_real = max(n_cls - 1, 1)
    gt = (1 + ((xx * n_real) // w + (yy * 3) // h) % n_real).astype(np.int64)
    # sprinkle unlabeled pixels
    gt[rng.rand(h, w) < 0.1] = 0
    # spectra: class-dependent mean + noise
    means = rng.rand(n_cls, bands).astype(np.float32)
    img1 = means[gt] + 0.05 * rng.randn(h, w, bands).astype(np.float32)
    img2 = (gt[..., None].astype(np.float32) / n_cls
            + 0.05 * rng.randn(h, w, 1).astype(np.float32))
    return img1, img2, gt


_H2013_LABELS = [
    "Unclassified", "Healthy grass", "Stressed grass", "Synthetic grass",
    "Trees", "Soil", "Water", "Residential", "Commercial", "Road", "Highway",
    "Railway", "Parking Lot 1", "Parking Lot 2", "Tennis Court",
    "Running Track",
]

_H2018_LABELS = [
    "Unclassified", "Healthy grass", "Stressed grass", "Artificial turf",
    "Evengreen trees", "Deciduous trees", "Bare earth", "Water",
    "Residential buildings", "Non-residential buildings ", "Roads",
    "Sidewalks", "Crosswalks", "Major thoroughfares", "Highway", "Railway",
    "Paved parking lots", "Unpaved parking lots", "Cars", "Trains",
    "Stadium seats",
]

_TRENTO_LABELS = [
    "Unclassified", "Apple trees", "Buildings", "Ground", "Wood", "Vineyard",
    "Roads",
]

_AUGSBURG_LABELS = [
    "Unclassified", "Forest", "Residential Area", "Industrial Area",
    "Low Plants", "Allotment", "Commercial Area", "Water",
]

_MUUFL_LABELS = [
    "Unclassified", "Trees", "Mostly grass", "Mixed ground surface",
    "Dirt and sand", "Road", "Water", "Buildings shadow", "Buildings",
    "Sidewalk", "Yellow curb", "Cloth panels",
]

_IP_LABELS = [
    "Unclassified", "Alfalfa", "Corn-notill", "Corn-mintill", "Corn",
    "Grass-pasture", "Grass-trees", "Grass-pasture-mowed", "Hay-windrowed",
    "Oats", "Soybean-notill", "Soybean-mintill", "Soybean-clean", "Wheat",
    "Woods", "Buildings-Grass-Trees-Drives", "Stone-Steel-Towers",
]

_SALINAS_LABELS = [
    "Undefined", "Brocoli_green_weeds_1", "Brocoli_green_weeds_2", "Fallow",
    "Fallow_rough_plow", "Fallow_smooth", "Stubble", "Celery",
    "Grapes_untrained", "Soil_vinyard_develop", "Corn_senesced_green_weeds",
    "Lettuce_romaine_4wk", "Lettuce_romaine_5wk", "Lettuce_romaine_6wk",
    "Lettuce_romaine_7wk", "Vinyard_untrained", "Vinyard_vertical_trellis",
]

_PAVIAU_LABELS = [
    "Undefined", "Asphalt", "Meadows", "Gravel", "Trees",
    "Painted metal sheets", "Bare Soil", "Bitumen", "Self-Blocking Bricks",
    "Shadows",
]

DATASETS: Dict[str, DatasetSpec] = {
    "Houston2013": DatasetSpec(
        name="Houston2013", label_values=_H2013_LABELS, rgb_bands=(59, 40, 23),
        hsi_file=("HSI.mat", "HSI"), lidar_file=("LiDAR.mat", "LiDAR"),
        gt_file=("gt.mat", "gt"),
    ),
    "Houston2018": DatasetSpec(
        name="Houston2018", label_values=_H2018_LABELS, rgb_bands=(49, 30, 23),
        hsi_file=("houston_hsi.mat", "houston_hsi"),
        lidar_file=("houston_lidar.mat", "houston_lidar"),
        gt_file=("houston_gt.mat", "houston_gt"),
    ),
    "Trento": DatasetSpec(
        name="Trento", label_values=_TRENTO_LABELS, rgb_bands=(40, 20, 10),
        hsi_file=("HSI.mat", "HSI"), lidar_file=("LiDAR.mat", "LiDAR"),
        gt_file=("trento_data.mat", "ground"),
    ),
    "Augsburg": DatasetSpec(
        name="Augsburg", label_values=_AUGSBURG_LABELS, rgb_bands=(22, 17, 9),
        hsi_file=("data_HS_LR.mat", "data_HS_LR"),
        lidar_file=("data_DSM.mat", "data_DSM"), gt_file=("gt.mat", "gt"),
    ),
    "MUUFL": DatasetSpec(
        name="MUUFL", label_values=_MUUFL_LABELS, rgb_bands=(28, 15, 10),
        lidar_per_band=True, loader=_muufl_loader,
    ),
    "IP": DatasetSpec(
        name="IP", label_values=_IP_LABELS, rgb_bands=(59, 40, 23),
        hsi_file=("Indian_pines_corrected.mat", "indian_pines_corrected"),
        lidar_file=("houston2013_LiDAR.mat", "LiDAR"),
        gt_file=("Indian_pines_gt.mat", "indian_pines_gt"),
    ),
    "Salinas": DatasetSpec(
        name="Salinas", label_values=_SALINAS_LABELS, rgb_bands=(59, 40, 23),
        hsi_file=("Salinas_corrected.mat", "salinas_corrected"),
        lidar_file=("LiDAR.mat", "LiDAR"),
        gt_file=("Salinas_gt.mat", "salinas_gt"),
    ),
    "PaviaU": DatasetSpec(
        name="PaviaU", label_values=_PAVIAU_LABELS, rgb_bands=(59, 40, 23),
        hsi_file=("PaviaU.mat", "paviaU"), lidar_file=("LiDAR.mat", "LiDAR"),
        gt_file=("PaviaU_gt.mat", "paviaU_gt"),
    ),
    "Synthetic": DatasetSpec(
        name="Synthetic",
        label_values=["Unclassified"] + [
            "Class {}".format(i) for i in range(1, int(os.environ.get("VCT_SYN_CLASSES", 15)))
        ],
        rgb_bands=(0, 1, 2), loader=_synthetic_loader,
    ),
}

# plugin hook (ref: datasets.py:51-56)
try:  # pragma: no cover - exercised only when a plugin file exists
    from custom_datasets import CUSTOM_DATASETS_CONFIG  # type: ignore

    for _k, _v in CUSTOM_DATASETS_CONFIG.items():
        if isinstance(_v, DatasetSpec):
            DATASETS[_k] = _v
except ImportError:
    pass

DATASETS_CONFIG = DATASETS  # alias matching the reference's public name


def dataset_names() -> List[str]:
    return list(DATASETS.keys())


def _maybe_download(spec: DatasetSpec, folder: str) -> None:
    """Fetch spec.urls into the dataset folder when files are missing
    (ref: datasets.py's tqdm-reporthook urlretrieve path). No-op when the
    spec has no URLs; failures surface as a clear message since most of
    these datasets are distributed manually."""
    if not spec.urls:
        return
    needed = [t[0] for t in (spec.hsi_file, spec.lidar_file, spec.gt_file)
              if t is not None]
    if all(os.path.exists(os.path.join(folder, f)) for f in needed):
        return
    os.makedirs(folder, exist_ok=True)
    import urllib.request

    for url in spec.urls:
        fname = os.path.join(folder, url.split("/")[-1])
        if os.path.exists(fname):
            continue
        try:
            try:
                from tqdm import tqdm

                class _Hook(tqdm):  # reference's TqdmUpTo pattern
                    def update_to(self, b=1, bsize=1, tsize=None):
                        if tsize is not None:
                            self.total = tsize
                        self.update(b * bsize - self.n)

                with _Hook(unit="B", unit_scale=True,
                           desc=os.path.basename(fname)) as t:
                    urllib.request.urlretrieve(url, fname, t.update_to)
            except ImportError:
                urllib.request.urlretrieve(url, fname)
        except Exception as e:  # zero-egress / offline environments
            raise RuntimeError(
                "Could not download {} for dataset {} ({}); place the file "
                "in {} manually.".format(url, spec.name, e, folder)) from e


def get_dataset(dataset_name: str, target_folder: str = "./",
                datasets: Dict[str, DatasetSpec] = DATASETS):
    """Load a dataset by name.

    Returns (img1, img2, gt, label_values, ignored_labels, rgb_bands, palette)
    with the same semantics as ref: datasets.py:76-458 — per-band [0,1]
    normalization for HSI, global (or per-band) for LiDAR, NaN filtering,
    ignored label 0.
    """
    if dataset_name not in datasets:
        raise ValueError("{} dataset is unknown.".format(dataset_name))
    spec = datasets[dataset_name]
    folder = os.path.join(target_folder, dataset_name)
    _maybe_download(spec, folder)

    if spec.loader is not None:
        img1, img2, gt = spec.loader(folder)
    else:
        hsi_fn, hsi_key = spec.hsi_file
        lidar_fn, lidar_key = spec.lidar_file
        gt_fn, gt_key = spec.gt_file
        img1 = open_file(os.path.join(folder, hsi_fn))[hsi_key].astype(np.float32)
        img2 = open_file(os.path.join(folder, lidar_fn))[lidar_key].astype(np.float32)
        if img2.ndim == 2:
            img2 = np.expand_dims(img2, axis=2)
        # paired-modality datasets crop the co-raster to the HSI footprint
        h, w = img1.shape[:2]
        img2 = img2[:h, :w]
        gt = open_file(os.path.join(folder, gt_fn))[gt_key]

    img1 = minmax_per_band(img1)
    img2 = minmax_per_band(img2) if spec.lidar_per_band else minmax_global(img2)

    gt = np.asarray(gt).astype(np.int64)
    img1, gt, had_nan = filter_nan(img1, gt)
    if had_nan:
        print("Warning: NaN have been found in the data. It is preferable to "
              "remove them beforehand. Learning on NaN data is disabled.")

    ignored_labels = sorted(set(list(spec.ignored_labels) + [0]))
    return (img1, img2, gt, list(spec.label_values), ignored_labels,
            spec.rgb_bands, None)
