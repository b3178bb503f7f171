"""Shared conventions for the model zoo.

Every model is a flax.linen Module with the uniform call signature

    model(hsi, lidar, train=False) -> logits | (logits, *aux)

where ``hsi`` is (B, P, P, C1) and ``lidar`` is (B, P, P, C2), NHWC —
the TPU-native layout (the reference uses NCHW; ref: model_utils.py:921).
Patch-1 models receive (B, 1, 1, C) and squeeze internally, so the harness
never branches on patch size.
"""

from __future__ import annotations

import jax.numpy as jnp


def squeeze_pixel(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, 1, C) -> (B, C); passthrough for (B, C)."""
    if x.ndim == 4:
        return x[:, 0, 0, :]
    return x
