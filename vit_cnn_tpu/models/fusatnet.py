"""FusAtNet: dual-attention spectro-spatial multimodal fusion.

Capability parity with the reference re-implementation of "FusAtNet: Dual
Attention based SpectroSpatial Multimodal Fusion Network for Hyperspectral
and LiDAR Classification" (ref: model/compare_method/FusAtNet.py:10-186):

* HSI feature extractor: 6x ConvUnit(3x3, SAME) -> 1024 channels,
* spectral attention: two pooled residual units -> convs -> max+avg pool
  to a (1, 1, 1024) gate,
* spatial attention from LiDAR: two unpooled residual units -> convs,
* modality feature/attention towers on concat [x1, x2, Ms, Mt],
* classifier: 5 valid 3x3 convs (11x11 -> 1x1) + 1x1 class conv.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import ConvBNReLU, adaptive_avg_pool, kaiming_out


class _ResUnitPooled(nn.Module):
    """Residual_Unit1: conv-bn-relu, +identity second conv, maxpool 2x2."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.features, (3, 3), padding=1)(x, train)
        identity = x
        x = ConvBNReLU(self.features, (3, 3), padding=1)(x, train)
        x = x + identity
        return nn.max_pool(x, (2, 2), strides=(2, 2))


class _ResUnit(nn.Module):
    """Residual_Unit2: same, without pooling."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.features, (3, 3), padding=1)(x, train)
        identity = x
        x = ConvBNReLU(self.features, (3, 3), padding=1)(x, train)
        return x + identity


class _ConvTower(nn.Module):
    """6x ConvUnit(3x3 SAME): used by both feature extractors."""

    out_features: int = 1024

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in (256, 256, 256, 256, 256, self.out_features):
            x = ConvBNReLU(f, (3, 3), padding=1)(x, train)
        return x


class _AttentionTower(nn.Module):
    """res(128) res(256) conv conv -> out_features (spatial/modality attn)."""

    out_features: int = 1024

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ResUnit(128)(x, train)
        x = _ResUnit(256)(x, train)
        x = ConvBNReLU(256, (3, 3), padding=1)(x, train)
        x = ConvBNReLU(self.out_features, (3, 3), padding=1)(x, train)
        return x


class FusAtNet(nn.Module):
    n_bands1: int
    n_bands2: int
    n_classes: int
    width: int = 1024

    @nn.compact
    def __call__(self, hsi, lidar, train: bool = False):
        w = self.width
        fhs = _ConvTower(w, name="hfe")(hsi, train)

        # spectral attention -> global (1, 1, w) gate (ref: :83-99)
        sa = _ResUnitPooled(256)(hsi, train)
        sa = _ResUnitPooled(256)(sa, train)
        sa = ConvBNReLU(256, (3, 3), padding=1)(sa, train)
        sa = ConvBNReLU(w, (3, 3), padding=1)(sa, train)
        sa = nn.max_pool(sa, (2, 2), strides=(2, 2))
        sa = adaptive_avg_pool(sa)[:, None, None, :]
        ms = sa * fhs

        mt = _AttentionTower(w, name="spatial_am")(lidar, train) * fhs

        stacked = jnp.concatenate([hsi, lidar, ms, mt], axis=-1)
        fm = _ConvTower(w, name="mfe")(stacked, train)
        am = _AttentionTower(w, name="mam")(stacked, train)
        fss = fm * am

        # classification module: valid convs 11->1 (ref: :148-166)
        x = fss
        for f in (256, 256, 256, 256, 1024):
            x = ConvBNReLU(f, (3, 3), padding=0)(x, train)
        x = nn.Conv(self.n_classes, (1, 1), kernel_init=kaiming_out)(x)
        return jnp.squeeze(x, axis=(1, 2))
