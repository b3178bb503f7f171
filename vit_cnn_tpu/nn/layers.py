"""Shared building blocks for the model zoo (NHWC, TPU-native).

These mirror recurring patterns in the reference zoo: Conv+BN+ReLU stacks,
torch-style 'SAME' max pooling (kernel 2, stride 2, pad 1 — e.g.
ref: model/compare_method/DML_Hong.py:18), adaptive average pooling, and
torch-compatible kaiming initialization (fan_out, relu).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

# torch nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu')
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BatchNorm(nn.Module):
    """BatchNorm with torch defaults (momentum 0.1 -> flax decay 0.9,
    eps 1e-5). Use everywhere for running-stat parity with the reference."""

    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=self.use_running_average,
                            momentum=0.9, epsilon=1e-5, name="bn")(x)


class ConvBNReLU(nn.Module):
    """Conv2d -> BatchNorm -> ReLU in NHWC."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, int] = "SAME"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=self.use_bias,
                    kernel_init=kaiming_out)(x)
        x = BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


def max_pool_same(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(kernel=2, stride=2, padding=1) — the reference's 'SAME'
    pooling (7->4->3 spatial)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding=((1, 1), (1, 1)))


def adaptive_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1): (B, H, W, C) -> (B, C)."""
    return jnp.mean(x, axis=(1, 2))


class MLP(nn.Module):
    """Transformer feed-forward: Dense -> GELU -> drop -> Dense -> drop."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    activation: Callable = nn.gelu

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim)(x)
        x = self.activation(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(out_dim)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
