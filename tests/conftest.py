"""Test configuration: force an 8-device virtual CPU mesh so sharding logic
is exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def synthetic_scene():
    """Small deterministic scene: (img1, img2, gt)."""
    from vit_cnn_tpu.data.registry import _synthetic_loader

    os.environ["VCT_SYN_H"] = "48"
    os.environ["VCT_SYN_W"] = "40"
    os.environ["VCT_SYN_BANDS"] = "20"
    os.environ["VCT_SYN_CLASSES"] = "5"
    try:
        return _synthetic_loader("")
    finally:
        for k in ("VCT_SYN_H", "VCT_SYN_W", "VCT_SYN_BANDS", "VCT_SYN_CLASSES"):
            os.environ.pop(k, None)
