"""Test configuration: force an 8-device virtual CPU mesh so sharding logic
is exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU even when the environment pins another platform (e.g. a
# tunneled TPU): unit tests must exercise the 8-device virtual mesh, and
# TPU recompiles per test would dominate runtime. NOTE: some environments
# pre-import jax from sitecustomize, so the env var alone is too late —
# jax.config.update is required (it works as long as no backend has been
# initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: CPU jit of the big models (flagship, MHST)
# dominates suite wall time on this 1-CPU host; cache compiled programs
# across runs. Threshold 1s: medium programs (2-5s x dozens of tests)
# add up. NOTE a cache populated by a DIFFERENT environment can poison
# runs (stale entries caused rare SIGABRTs and wrong-numerics flakes,
# 2026-08-17 — wipe ~/.cache/vct_jax_cache_cpu if the suite aborts or
# models inexplicably stop learning in-suite only).
_cache_dir = os.path.expanduser("~/.cache/vct_jax_cache_cpu")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

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
