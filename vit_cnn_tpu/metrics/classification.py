"""Classification metrics: confusion matrix, OA, per-class F1/precision,
AA (mean recall), Cohen's Kappa.

Numerically identical to ref: utils.py:585-663, including its quirks:
* "Precisions" is cm[i,i]/row-sum (i.e. per-class recall, kept under the
  reference's name for report parity),
* F1/precision of an empty class is NaN (the reference's ZeroDivisionError
  guard never fires on numpy scalars),
* AA averages recalls over classes present in the target (NaN skipped).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def confusion(prediction: np.ndarray, target: np.ndarray,
              n_classes: int) -> np.ndarray:
    """Row = true class, column = predicted class."""
    mask = (target >= 0) & (target < n_classes)
    idx = n_classes * target[mask].astype(np.int64) + prediction[mask].astype(np.int64)
    cm = np.bincount(idx, minlength=n_classes * n_classes)
    return cm.reshape(n_classes, n_classes)


def metrics(prediction: np.ndarray, target: np.ndarray,
            ignored_labels: Sequence[int] = (), n_classes: int = None) -> Dict:
    """Compute OA/AA/Kappa/F1/precision + confusion matrix
    (ref: utils.py:585-663)."""
    ignored_mask = np.zeros(target.shape[:2], dtype=bool)
    for l in ignored_labels:
        ignored_mask[target == l] = True
    keep = ~ignored_mask
    target = target[keep]
    prediction = prediction[keep]

    results: Dict = {}
    n_classes = int(np.max(target)) + 1 if n_classes is None else n_classes
    cm = confusion(prediction, target, n_classes)
    results["Confusion matrix"] = cm

    total = np.sum(cm)
    accuracy = float(np.trace(cm)) * 100.0 / float(total)
    results["Accuracy"] = accuracy

    with np.errstate(divide="ignore", invalid="ignore"):
        diag = np.diag(cm).astype(np.float64)
        row = cm.sum(axis=1).astype(np.float64)
        col = cm.sum(axis=0).astype(np.float64)
        f1 = 2.0 * diag / (row + col)          # NaN when row+col == 0
        prec = diag / row                      # NaN when row == 0 (it's recall)
    results["F1 scores"] = f1
    results["Precisions"] = prec

    recalls = prec[~np.isnan(prec)]
    results["AA"] = float(np.mean(recalls)) if recalls.size else float("nan")

    pa = np.trace(cm) / float(total)
    pe = np.sum(cm.sum(axis=0) * cm.sum(axis=1)) / float(total) ** 2
    results["Kappa"] = float((pa - pe) / (1 - pe))
    return results
