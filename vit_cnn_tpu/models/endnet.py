"""EndNet: dual MLP encoder-decoder fusion for pixel (patch=1) HSI+LiDAR.

Capability parity with the reference re-implementation of
"Deep Encoder-Decoder Networks for Classification of Hyperspectral and
LiDAR Data" (ref: model/compare_method/EndNet.py:9-90):

* per-modality 4-layer MLP encoders 16→32→64→128 with BatchNorm+ReLU,
* concat → joint FC(256→128) + BN + ReLU, head FC(128→64→K)
  (the final BN on logits exists in the reference but is never applied),
* dual 4-layer sigmoid MLP decoders reconstructing both inputs,
* returns (logits, recon1, recon2, input1, input2) for
  :func:`vit_cnn_tpu.train.losses.endnet_loss`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import BatchNorm
from .base import squeeze_pixel


class _MLPEncoder(nn.Module):
    filters: tuple  # (16, 32, 64, 128)

    @nn.compact
    def __call__(self, x, train: bool):
        for f in self.filters:
            x = nn.Dense(f)(x)
            x = BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
        return x


class _MLPDecoder(nn.Module):
    filters: tuple  # (64, 32, 16, out)

    @nn.compact
    def __call__(self, x):
        for f in self.filters:
            x = nn.Dense(f)(x)
            x = nn.sigmoid(x)
        return x


class EndNet(nn.Module):
    n_bands1: int
    n_bands2: int
    n_classes: int
    width: int = 16

    @nn.compact
    def __call__(self, hsi, lidar, train: bool = False):
        x1 = squeeze_pixel(hsi)
        x2 = squeeze_pixel(lidar)
        ori_x1, ori_x2 = x1, x2
        n1 = self.width
        filters = (n1, n1 * 2, n1 * 4, n1 * 8)

        e1 = _MLPEncoder(filters, name="encoder_a")(x1, train)
        e2 = _MLPEncoder(filters, name="encoder_b")(x2, train)

        joint = jnp.concatenate([e1, e2], axis=1)
        joint = nn.Dense(filters[3], name="joint_fc5")(joint)
        joint = BatchNorm(use_running_average=not train,
                          name="joint_bn5")(joint)
        joint = nn.relu(joint)

        out = nn.Dense(filters[2], name="joint_fc6")(joint)
        out = BatchNorm(use_running_average=not train,
                        name="joint_bn6")(out)
        out = nn.relu(out)
        logits = nn.Dense(self.n_classes, name="head")(out)

        de1 = _MLPDecoder((filters[2], filters[1], filters[0], self.n_bands1),
                          name="decoder_a")(joint)
        de2 = _MLPDecoder((filters[2], filters[1], filters[0], self.n_bands2),
                          name="decoder_b")(joint)
        return logits, de1, de2, ori_x1, ori_x2
