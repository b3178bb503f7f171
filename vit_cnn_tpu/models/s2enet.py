"""S2ENet: spatial/spectral cross-modal enhancement network.

The reference ships only compiled bytecode (model/__pycache__/
S2ENet.cpython-39.pyc — source missing, SURVEY.md §0); this implementation
was recovered by disassembling that bytecode:

* two conv_bn_relu branches: HSI 128->64->32, LiDAR 8->16->32 (3x3, pad 1),
* SAEM (Spatial Enhancement): sigmoid-gated 1x1 projections T1/T2 to 16ch,
  spatial affinity (HW x HW) -> Conv1d(HW->1, no bias) -> (1, H, W) gate on
  the HSI features,
* SEEM (Spectral Enhancement): same with a channel affinity (C x C) ->
  Conv1d(C->1) -> per-channel gate on the LiDAR features,
* FusionLayer Conv1x1(64->32)+BN+ReLU, avg pool, Linear(32, K).

The bytecode also constructs unused `g`/`W_z` submodules inside SAEM/SEEM
(dead parameters, never touched in forward); they are omitted here.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import BatchNorm, ConvBNReLU, adaptive_avg_pool, kaiming_out


class _GatedProj(nn.Module):
    """T1/T2: Conv1x1 -> BN -> Sigmoid."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), kernel_init=kaiming_out)(x)
        x = BatchNorm(use_running_average=not train)(x)
        return nn.sigmoid(x)


class SpatialEnhanceModule(nn.Module):
    """SAEM: x1 gated by a spatial affinity map with x2."""

    inter_channels: int
    size: int  # patch side; affinity is (size^2, size^2)

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        b, h, w, _ = x1.shape
        t1 = _GatedProj(self.inter_channels, name="T1")(x1, train)
        t2 = _GatedProj(self.inter_channels, name="T2")(x2, train)
        t1 = t1.reshape(b, h * w, self.inter_channels)
        t2 = t2.reshape(b, h * w, self.inter_channels)
        # (B, HW, C') @ (B, C', HW) -> (B, HW, HW)
        affinity = jnp.einsum("bic,bjc->bij", t1, t2)
        affinity = jnp.swapaxes(affinity, 1, 2)
        # Conv1d(HW -> 1, k=1, bias=False) over the first HW axis
        wred = self.param("dim_reduce",
                          nn.initializers.lecun_normal(), (1, h * w))
        gate = jnp.einsum("oi,bij->boj", wred, affinity)  # (B, 1, HW)
        gate = gate.reshape(b, h, w, 1)
        return x1 * gate


class SpectralEnhanceModule(nn.Module):
    """SEEM: x1 gated per-channel by a channel affinity with x2."""

    inter_channels: int
    inter_channels2: int

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        b, h, w, c1 = x1.shape
        t1 = _GatedProj(self.inter_channels, name="T1")(x1, train)
        t2 = _GatedProj(self.inter_channels2, name="T2")(x2, train)
        t1 = t1.reshape(b, h * w, self.inter_channels)
        t2 = t2.reshape(b, h * w, self.inter_channels2)
        # (B, C1', HW) @ (B, HW, C2') -> (B, C1', C2'), then transpose
        affinity = jnp.einsum("bic,bid->bcd", t1, t2)
        affinity = jnp.swapaxes(affinity, 1, 2)  # (B, C2', C1')
        wred = self.param("dim_reduce", nn.initializers.lecun_normal(),
                          (1, self.inter_channels2))
        gate = jnp.einsum("oi,bij->boj", wred, affinity)  # (B, 1, C1')
        gate = gate.reshape(b, 1, 1, c1)
        return x1 * gate


class S2ENet(nn.Module):
    n_bands1: int
    n_bands2: int
    n_classes: int
    patch_size: int

    @nn.compact
    def __call__(self, hsi, lidar, train: bool = False):
        planes_a = (128, 64, 32)
        planes_b = (8, 16, 32)
        x1, x2 = hsi, lidar
        for f in planes_a:
            x1 = ConvBNReLU(f, (3, 3), padding=1)(x1, train)
        for f in planes_b:
            x2 = ConvBNReLU(f, (3, 3), padding=1)(x2, train)

        ss_x1 = SpatialEnhanceModule(planes_a[2] // 2, self.patch_size,
                                     name="SAEM")(x1, x2, train)
        ss_x2 = SpectralEnhanceModule(planes_b[2], planes_a[2],
                                      name="SEEM")(x2, x1, train)

        x = jnp.concatenate([ss_x1, ss_x2], axis=-1)
        x = nn.Conv(planes_a[2], (1, 1), kernel_init=kaiming_out,
                    name="fusion_conv")(x)
        x = BatchNorm(use_running_average=not train, name="fusion_bn")(x)
        x = nn.relu(x)
        x = adaptive_avg_pool(x)
        return nn.Dense(self.n_classes, name="fc")(x)
