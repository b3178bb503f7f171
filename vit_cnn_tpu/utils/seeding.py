"""Determinism helpers.

TPU-native replacement for ref: utils.py:887-895 (seed_torch): numpy/python
RNGs are seeded for the host-side samplers; device-side randomness flows
through explicit jax.random keys instead of global state.
"""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int):
    """Seed host RNGs and return a root jax PRNG key."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
