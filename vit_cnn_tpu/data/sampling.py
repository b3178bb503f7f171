"""Ground-truth samplers and class-balancing weights.

Behavioral parity with ref: utils.py:754-881 (sample_gt, samplingFixedNum,
compute_imf_weights), including the exact seeding of 'random_fixednumber'.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def sampling_fixed_num(sample_num: int, ground_truth: np.ndarray,
                       seed: int) -> Tuple[List[int], List[int]]:
    """Pick `sample_num` flat indices per class (ref: utils.py:754-773).

    `ground_truth` is the flattened GT vector; classes are 1..max(gt).
    Reproduces the reference's RNG call order exactly so splits match.
    """
    np.random.seed(seed)
    m = int(ground_truth.max())
    train_, test_ = {}, {}
    flat = ground_truth.ravel()
    for i in range(m):
        indices = np.nonzero(flat == i + 1)[0].tolist()
        np.random.shuffle(indices)
        train_[i] = indices[:sample_num]
        test_[i] = indices[sample_num:]
    train_fix: List[int] = []
    test_fix: List[int] = []
    for i in range(m):
        train_fix += train_[i]
        test_fix += test_[i]
    np.random.shuffle(train_fix)
    np.random.shuffle(test_fix)
    return train_fix, test_fix


def sample_gt(gt: np.ndarray, train_size: float, mode: str = "random",
              seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Split a 2D GT map into train/test GT maps (ref: utils.py:775-846).

    Modes: 'random' (stratified), 'fixed' (per-class count), 'disjoint'
    (spatial top/bottom), 'random_fixednumber' (N per class, seeded).
    """
    import sklearn.model_selection

    indices = np.nonzero(gt)
    X = list(zip(*indices))
    y = gt[indices].ravel()
    train_gt = np.zeros_like(gt)
    test_gt = np.zeros_like(gt)
    if train_size > 1:
        train_size = int(train_size)

    if mode == "random":
        train_idx, test_idx = sklearn.model_selection.train_test_split(
            X, train_size=train_size, stratify=y)
        train_idx = [list(t) for t in zip(*train_idx)]
        test_idx = [list(t) for t in zip(*test_idx)]
        train_gt[train_idx[0], train_idx[1]] = gt[train_idx[0], train_idx[1]]
        test_gt[test_idx[0], test_idx[1]] = gt[test_idx[0], test_idx[1]]
    elif mode == "fixed":
        train_idx, test_idx = [], []
        for c in np.unique(gt):
            if c == 0:
                continue
            idx = np.nonzero(gt == c)
            Xc = list(zip(*idx))
            train, test = sklearn.model_selection.train_test_split(
                Xc, train_size=train_size)
            train_idx += train
            test_idx += test
        ti = [list(t) for t in zip(*train_idx)]
        te = [list(t) for t in zip(*test_idx)]
        train_gt[ti[0], ti[1]] = gt[ti[0], ti[1]]
        test_gt[te[0], te[1]] = gt[te[0], te[1]]
    elif mode == "disjoint":
        train_gt = np.copy(gt)
        test_gt = np.copy(gt)
        for c in np.unique(gt):
            mask = gt == c
            for x in range(gt.shape[0]):
                first_half = np.count_nonzero(mask[:x, :])
                second_half = np.count_nonzero(mask[x:, :])
                total = first_half + second_half
                if total == 0:
                    continue
                if first_half / total > 0.9 * train_size:
                    break
            mask[:x, :] = 0
            train_gt[mask] = 0
        test_gt[train_gt > 0] = 0
    elif mode == "random_fixednumber":
        flat = gt.reshape(-1).astype(np.int64)
        train_idx, test_idx = sampling_fixed_num(int(train_size), flat, seed)
        tr = np.zeros(flat.shape[0], dtype=gt.dtype)
        te = np.zeros(flat.shape[0], dtype=gt.dtype)
        tr[train_idx] = flat[train_idx]
        te[test_idx] = flat[test_idx]
        train_gt = tr.reshape(gt.shape)
        test_gt = te.reshape(gt.shape)
    else:
        raise ValueError("{} sampling is not implemented yet.".format(mode))
    return train_gt, test_gt


def compute_imf_weights(ground_truth: np.ndarray, n_classes: int = None,
                        ignored_classes: Sequence[int] = ()) -> np.ndarray:
    """Inverse-median-frequency class weights (ref: utils.py:849-881)."""
    n_classes = int(np.max(ground_truth)) if n_classes is None else n_classes
    weights = np.zeros(n_classes)
    frequencies = np.zeros(n_classes)
    for c in range(n_classes):
        if c in ignored_classes:
            continue
        frequencies[c] = np.count_nonzero(ground_truth == c)
    frequencies /= np.sum(frequencies)
    idx = np.nonzero(frequencies)
    median = np.median(frequencies[idx])
    weights[idx] = median / frequencies[idx]
    weights[frequencies == 0] = 0.0
    return weights
