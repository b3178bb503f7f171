"""CLI surface: flag parity with ref: main.py:69-254 + end-to-end run."""

import numpy as np
import pytest

from vit_cnn_tpu.cli import build_parser, run_experiments


REFERENCE_FLAGS = [
    # ref: main.py:69-254, one per add_argument
    "--dataset", "--applyPCA", "--model", "--folder", "--cuda", "--runs",
    "--restore", "--seed", "--train_val_split", "--training_sample",
    "--sampling_mode", "--train_set", "--test_set", "--epoch",
    "--patch_size", "--lr", "--class_balancing", "--batch_size",
    "--test_stride", "--flip_augmentation", "--radiation_augmentation",
    "--mixture_augmentation", "--with_exploration", "--download",
]


def test_all_reference_flags_exist():
    parser = build_parser()
    known = set()
    for action in parser._actions:
        known.update(action.option_strings)
    missing = [f for f in REFERENCE_FLAGS if f not in known]
    assert not missing, "missing reference flags: {}".format(missing)


def test_reference_defaults():
    args = build_parser().parse_args([])
    # ref: main.py defaults
    assert args.dataset == "MUUFL"
    assert args.model == "Multimodality_Mamba"
    assert args.folder == "./Datasets/"
    assert args.runs == 10
    assert args.seed == 1
    assert args.train_val_split == 1
    assert args.training_sample == 20
    assert args.sampling_mode == "random_fixednumber"
    assert args.test_stride == 1
    assert args.flip_augmentation is False
    assert args.class_balancing is False


def test_cli_end_to_end(tmp_path):
    args = build_parser().parse_args([
        "--dataset", "Synthetic", "--model", "EndNet", "--runs", "2",
        "--epoch", "2", "--sampling_mode", "random", "--training_sample",
        "0.5", "--out_dir", str(tmp_path), "--log_every", "0",
        "--infer_chunk", "256", "--no_mesh"])
    results = run_experiments(args)
    assert len(results) == 2
    for r in results:
        assert np.isfinite(r["Accuracy"])
        assert 0 <= r["Accuracy"] <= 100
    out = tmp_path / "Synthetic_EndNet"
    assert (out / "dataset_rgb.png").exists()
    assert (out / "lidar.png").exists()
    assert (out / "report.txt").exists()
    assert (out / "metrics.jsonl").exists()
    preds = list(out.glob("Prediction*.png"))
    assert len(preds) >= 2


def test_cli_mesh_end_to_end(tmp_path):
    """Sharded path: 8 virtual CPU devices, DP train + sharded inference."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (virtual CPU mesh)")
    args = build_parser().parse_args([
        "--dataset", "Synthetic", "--model", "EndNet", "--runs", "1",
        "--epoch", "1", "--sampling_mode", "random", "--training_sample",
        "0.5", "--out_dir", str(tmp_path), "--log_every", "0",
        "--infer_chunk", "256"])
    results = run_experiments(args)
    assert len(results) == 1
    assert np.isfinite(results[0]["Accuracy"])
