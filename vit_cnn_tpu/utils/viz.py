"""Artifact writer — the decoupled replacement for the reference's Visdom
client (ref: main.py:306-340, utils.py:169-270).

The reference streams every visualization (dataset RGB composite, LiDAR
grayscale, GT / prediction maps, per-class mean spectra, loss curves) to a
live Visdom HTTP server. A TPU pod job has no business holding an HTTP
socket open from the train loop, so the same artifacts are written to a
run directory as PNGs + a JSONL metrics stream instead; any dashboard can
tail them.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Sequence

import numpy as np


def _save_png(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        lo, hi = float(np.nanmin(arr)), float(np.nanmax(arr))
        arr = ((arr - lo) / max(hi - lo, 1e-12) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


class ArtifactWriter:
    """Writes the reference's Visdom surface to ``<out_dir>/``."""

    def __init__(self, out_dir: str = "./results/artifacts"):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._metrics_path = os.path.join(out_dir, "metrics.jsonl")

    # -- scalar stream (loss / val-acc curves; ref: model_utils.py:940-974)
    def log_scalars(self, step: int, scalars: Dict[str, float],
                    run: Optional[int] = None) -> None:
        rec = {"ts": time.time(), "step": step, **scalars}
        if run is not None:
            rec["run"] = run
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    # -- dataset RGB composite (ref: utils.py:169-186 display_dataset)
    def save_dataset_rgb(self, img: np.ndarray,
                         rgb_bands: Sequence[int]) -> None:
        rgb = np.stack([img[..., b] for b in rgb_bands], axis=-1)
        rgb = (255.0 * np.clip(rgb, 0.0, 1.0)).astype(np.uint8)
        _save_png(os.path.join(self.out_dir, "dataset_rgb.png"), rgb)

    # -- LiDAR grayscale (ref: utils.py:189-198 display_lidar_data)
    def save_lidar(self, img: np.ndarray) -> None:
        _save_png(os.path.join(self.out_dir, "lidar.png"), img[..., 0])

    # -- GT / prediction color maps (ref: utils.py display_predictions)
    def save_map(self, color_map: np.ndarray, caption: str,
                 run: Optional[int] = None) -> None:
        name = caption.replace(" ", "_").replace(":", "").replace("/", "-")
        if run is not None:
            name = "{}_run{}".format(name, run)
        _save_png(os.path.join(self.out_dir, name + ".png"), color_map)

    # -- per-class mean spectra (ref: utils.py:218-270 explore_spectrums)
    def explore_spectrums(self, img: np.ndarray, gt: np.ndarray,
                          label_values: Sequence[str],
                          ignored_labels: Sequence[int] = (0,)
                          ) -> Dict[str, np.ndarray]:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        mean_spectrums = {}
        fig, ax = plt.subplots(figsize=(9, 5))
        for c in np.unique(gt):
            if c in ignored_labels:
                continue
            spectrums = img[gt == c].reshape(-1, img.shape[-1])
            mean = np.mean(spectrums, axis=0)
            std = np.std(spectrums, axis=0)
            ax.plot(mean, label=label_values[c])
            ax.fill_between(np.arange(len(mean)), mean - std, mean + std,
                            alpha=0.2)
            mean_spectrums[label_values[c]] = mean
        ax.set_xlabel("band")
        ax.set_ylabel("reflectance")
        ax.legend(fontsize=6)
        fig.savefig(os.path.join(self.out_dir, "mean_spectrums.png"),
                    dpi=150, bbox_inches="tight")
        plt.close(fig)
        return mean_spectrums

    # -- confusion-matrix heatmap (ref: utils.py:676-684)
    def save_confusion_matrix(self, cm: np.ndarray,
                              run: Optional[int] = None) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 6))
        im = ax.imshow(cm, cmap="viridis")
        fig.colorbar(im, ax=ax)
        ax.set_xlabel("predicted")
        ax.set_ylabel("true")
        name = "confusion_matrix" if run is None else \
            "confusion_matrix_run{}".format(run)
        fig.savefig(os.path.join(self.out_dir, name + ".png"), dpi=150,
                    bbox_inches="tight")
        plt.close(fig)

    # -- feature-map viz (ref: model_utils.py:661-679 show_featuremap:
    #    first sample of a (B, C, H, W) activation as an RGB composite)
    def show_featuremap(self, name: str, fm: np.ndarray,
                        rgb_bands: Sequence[int] = (0, 1, 2)) -> None:
        fm = np.asarray(fm)[0]                        # first sample
        if fm.ndim == 3 and fm.shape[-1] < fm.shape[0]:
            pass                                      # already (H, W, C)
        elif fm.ndim == 3:
            fm = fm.transpose(1, 2, 0)                # (C, H, W) -> HWC
        bands = [min(b, fm.shape[-1] - 1) for b in rgb_bands]
        rgb = np.stack([fm[..., b] for b in bands], axis=-1)
        _save_png(os.path.join(self.out_dir,
                               "featuremap_{}.png".format(name)), rgb)

    # -- text report (mirrors what show_results prints)
    def save_report(self, text: str, name: str = "report.txt") -> None:
        with open(os.path.join(self.out_dir, name), "a") as f:
            f.write(text + "\n")
