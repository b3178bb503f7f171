"""Golden tests for metrics parity with the reference formulas
(ref: utils.py:585-663)."""

import numpy as np
import pytest

from vit_cnn_tpu.metrics import metrics, format_results


def test_perfect_prediction():
    target = np.array([[1, 2], [3, 0]])
    pred = np.array([[1, 2], [3, 9]])  # ignored pixel mispredicted: no effect
    r = metrics(pred, target, ignored_labels=[0], n_classes=4)
    assert r["Accuracy"] == 100.0
    assert r["Kappa"] == pytest.approx(1.0)
    assert r["AA"] == pytest.approx(1.0)


def test_hand_computed_confusion():
    # 2 classes (1, 2) + ignored 0; 6 labeled pixels
    target = np.array([[1, 1, 1], [2, 2, 2]])
    pred = np.array([[1, 1, 2], [2, 2, 1]])
    r = metrics(pred, target, ignored_labels=[0], n_classes=3)
    cm = r["Confusion matrix"]
    assert cm.tolist() == [[0, 0, 0], [0, 2, 1], [0, 1, 2]]
    assert r["Accuracy"] == pytest.approx(4 / 6 * 100)
    # per-class recall = 2/3 for both; AA = 2/3 (class 0 absent -> NaN skipped)
    assert r["AA"] == pytest.approx(2 / 3)
    # F1 class1 = 2*2/(3+3) = 2/3
    assert r["F1 scores"][1] == pytest.approx(2 / 3)
    # kappa: pa=2/3, pe=(3*3+3*3)/36=1/2 -> (2/3-1/2)/(1/2)=1/3
    assert r["Kappa"] == pytest.approx(1 / 3)


def test_empty_class_is_nan_and_aa_skips():
    target = np.array([[1, 1], [1, 1]])
    pred = np.array([[1, 1], [1, 2]])
    r = metrics(pred, target, ignored_labels=[0], n_classes=3)
    assert np.isnan(r["F1 scores"][0])       # class 0 empty
    assert np.isnan(r["Precisions"][2])      # class 2 has no target pixels
    assert r["AA"] == pytest.approx(3 / 4)   # only class 1 counted


def test_report_format_single_and_aggregated():
    target = np.array([[1, 2], [1, 2]])
    pred = np.array([[1, 2], [2, 1]])
    r = metrics(pred, target, ignored_labels=[0], n_classes=3)
    labels = ["Unclassified", "A", "B"]
    text = format_results(0, r, labels)
    assert "Accuracy : " in text and "Kappa: " in text and "AA : " in text
    agg = format_results(1, [r, r], labels, agregated=True)
    assert "Agregated results :" in agg and "+-" in agg
