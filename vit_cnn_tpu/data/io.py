"""File IO helpers for remote-sensing rasters.

TPU-native replacement for the reference's ``utils.open_file``
(ref: utils.py:109-122): .mat via scipy.io.loadmat, .npy/.npz natively,
.tif via imageio when present.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def open_file(path: str) -> Any:
    """Open a dataset file. For ``.mat`` returns the loadmat dict
    (ref: utils.py:109-114); ``.npy`` returns the array; ``.npz`` the archive.
    """
    _, ext = os.path.splitext(path)
    ext = ext.lower()
    if ext == ".mat":
        from scipy import io as scipy_io

        return scipy_io.loadmat(path)
    elif ext == ".npy":
        return np.load(path)
    elif ext == ".npz":
        return np.load(path)
    elif ext in (".tif", ".tiff"):
        import imageio.v2 as imageio

        return imageio.imread(path)
    elif ext == ".hdr":
        import spectral

        return spectral.open_image(path).load()
    else:
        raise ValueError("Unknown file format: {}".format(ext))


def load_mat_key(path: str, key: str) -> np.ndarray:
    """Load one variable from a .mat file."""
    return open_file(path)[key]
