"""Tests for GT samplers and class balancing (ref: utils.py:754-881)."""

import numpy as np
import pytest

from vit_cnn_tpu.data import sample_gt, compute_imf_weights


def _gt(rng, h=30, w=30, n_cls=4, unlabeled=0.3):
    gt = rng.randint(1, n_cls + 1, size=(h, w))
    gt[rng.rand(h, w) < unlabeled] = 0
    return gt


def test_random_split_stratified_counts(rng):
    gt = _gt(rng)
    train, test = sample_gt(gt, 0.2, mode="random")
    n = np.count_nonzero(gt)
    assert np.count_nonzero(train) == pytest.approx(0.2 * n, abs=3)
    # disjoint and complete
    assert np.count_nonzero(train & test) == 0  # no shared labeled pixel
    assert np.count_nonzero(train) + np.count_nonzero(test) == n


def test_fixed_number_per_class(rng):
    gt = _gt(rng, h=40, w=40)
    train, test = sample_gt(gt, 10, mode="random_fixednumber", seed=3)
    for c in range(1, 5):
        assert np.count_nonzero(train == c) == 10
        assert (np.count_nonzero(test == c)
                == np.count_nonzero(gt == c) - 10)


def test_fixed_number_is_seeded(rng):
    gt = _gt(rng, h=40, w=40)
    t1, _ = sample_gt(gt, 5, mode="random_fixednumber", seed=7)
    t2, _ = sample_gt(gt, 5, mode="random_fixednumber", seed=7)
    t3, _ = sample_gt(gt, 5, mode="random_fixednumber", seed=8)
    assert np.array_equal(t1, t2)
    assert not np.array_equal(t1, t3)


def test_disjoint_split_is_spatial(rng):
    gt = _gt(rng, h=40, w=20)
    train, test = sample_gt(gt, 0.5, mode="disjoint")
    assert np.count_nonzero((train > 0) & (test > 0)) == 0
    # training pixels of each class sit above test pixels of the same class
    for c in range(1, 5):
        tr_rows = np.nonzero(train == c)[0]
        te_rows = np.nonzero(test == c)[0]
        if len(tr_rows) and len(te_rows):
            assert tr_rows.max() <= te_rows.min()


def test_imf_weights():
    gt = np.array([[1, 1, 1, 2], [2, 2, 2, 2]])
    w = compute_imf_weights(gt, n_classes=3, ignored_classes=[0])
    # freqs: c1=3/8, c2=5/8 -> median=0.5 -> w1=4/3, w2=0.8
    assert w[1] == pytest.approx((0.5) / (3 / 8))
    assert w[2] == pytest.approx((0.5) / (5 / 8))
    assert w[0] == 0.0
