"""Window/padding machinery — parity with the reference's sliding-window
helpers beyond the origin generator (ref: utils.py:320-354 padding,
:417-563 window split/reassembly, :567-582 grouper).

The one-program full-scene path (:mod:`.fullscene`) doesn't need these, but
they are part of the reference's public surface: the CLI's metrics-retry
path un-pads oversized probability maps (ref: main.py:503-519), and the
single-image window utilities support patch-based models whose outputs are
reassembled into a raster.
"""

from __future__ import annotations

import itertools
from typing import Iterable, Iterator, List, Tuple

import numpy as np


def padding_image(image: np.ndarray, patch_size: Tuple[int, int],
                  mode: str = "symmetric") -> np.ndarray:
    """Pad an (H, W, C) raster by patch//2 on each side
    (ref: utils.py:320-344)."""
    ph, pw = patch_size[0] // 2, patch_size[1] // 2
    pads = ((ph, ph), (pw, pw)) + ((0, 0),) * (image.ndim - 2)
    return np.pad(image, pads, mode=mode)


def restore_from_padding(padded: np.ndarray,
                         patch_size: Tuple[int, int]) -> np.ndarray:
    """Inverse of :func:`padding_image` (ref: utils.py:346-354)."""
    ph, pw = patch_size[0] // 2, patch_size[1] // 2
    h, w = padded.shape[:2]
    return padded[ph:h - ph, pw:w - pw]


def grouper(n: int, iterable: Iterable) -> Iterator[tuple]:
    """Chunk an iterable into n-tuples; last group may be short
    (ref: utils.py:567-582)."""
    it = iter(iterable)
    while True:
        chunk = tuple(itertools.islice(it, n))
        if not chunk:
            return
        yield chunk


def generate_windows(image: np.ndarray, window: Tuple[int, int],
                     step: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Split one raster into (N, wh, ww, C) windows + (N, 2) origins,
    clamping the trailing window to the border like the reference's
    generator (ref: utils.py:417-470, 357-390)."""
    from .fullscene import sliding_window_origins

    h, w = image.shape[:2]
    origins = sliding_window_origins(h, w, max(window), step)
    wh, ww = window
    out = np.stack([image[x:x + wh, y:y + ww] for x, y in origins])
    return out, origins


def adding_windows_singleimage(windows: np.ndarray, origins: np.ndarray,
                               out_shape: Tuple[int, ...]) -> np.ndarray:
    """Overlap-add window contents back into a raster, averaging overlaps
    (ref: utils.py:472-563 reassembly)."""
    acc = np.zeros(out_shape, dtype=np.float64)
    cnt = np.zeros(out_shape[:2] + (1,) * (len(out_shape) - 2),
                   dtype=np.float64)
    wh, ww = windows.shape[1:3]
    for win, (x, y) in zip(windows, origins):
        acc[x:x + wh, y:y + ww] += win
        cnt[x:x + wh, y:y + ww] += 1
    return (acc / np.maximum(cnt, 1)).astype(windows.dtype)
