"""MDL-RS fusion CNNs: early / middle / late / cross fusion.

Capability parity with the reference re-implementation of "More Diverse
Means Better: Multimodal Deep Learning Meets Remote-Sensing Imagery
Classification" (ref: model/compare_method/DML_Hong.py:9-324):

* stem per branch: 3x3 conv(+BN+ReLU) -> 1x1 conv -> SAME maxpool
  -> 3x3 conv -> 1x1 conv -> SAME maxpool (7x7 -> 4x4 -> 3x3),
* joint trunk: two 1x1 convs -> adaptive avg pool -> 1x1 class conv,
* fusion points differ per variant; Cross_fusion shares its stage-4
  conv/BN across modalities and returns three logit sets for the
  consistency loss (ref: losses.py:7-19).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import ConvBNReLU, adaptive_avg_pool, kaiming_out, max_pool_same

_N1 = 16
_FILTERS = (_N1, _N1 * 2, _N1 * 4, _N1 * 8, _N1 * 16)


class _Stem(nn.Module):
    """conv1(3x3) conv2(1x1) pool conv3(3x3) [conv4(1x1) pool]."""

    upto4: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = _FILTERS
        x = ConvBNReLU(f[0], (3, 3), padding=1)(x, train)
        x = ConvBNReLU(f[1], (1, 1), padding=0)(x, train)
        x = max_pool_same(x)
        x = ConvBNReLU(f[2], (3, 3), padding=1)(x, train)
        if self.upto4:
            x = ConvBNReLU(f[3], (1, 1), padding=0)(x, train)
            x = max_pool_same(x)
        return x


class _JointHead(nn.Module):
    """conv5(1x1)+conv6(1x1) -> avg pool -> class conv."""

    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = _FILTERS
        x = ConvBNReLU(f[3], (1, 1), padding=0)(x, train)
        x = ConvBNReLU(f[2], (1, 1), padding=0)(x, train)
        x = adaptive_avg_pool(x)
        return nn.Dense(self.n_classes, kernel_init=kaiming_out)(x)


class Early_fusion_CNN(nn.Module):
    """Input-level concat (ref: DML_Hong.py:9-63)."""

    n_bands1: int
    n_bands2: int
    n_classes: int

    @nn.compact
    def __call__(self, hsi, lidar, train: bool = False):
        x = jnp.concatenate([hsi, lidar], axis=-1)
        x = _Stem()(x, train)
        return _JointHead(self.n_classes)(x, train)


class Middle_fusion_CNN(nn.Module):
    """Feature-level concat after both stems (ref: DML_Hong.py:65-140)."""

    n_bands1: int
    n_bands2: int
    n_classes: int

    @nn.compact
    def __call__(self, hsi, lidar, train: bool = False):
        x1 = _Stem(name="stem_a")(hsi, train)
        x2 = _Stem(name="stem_b")(lidar, train)
        x = jnp.concatenate([x1, x2], axis=-1)
        return _JointHead(self.n_classes)(x, train)


class Late_fusion_CNN(nn.Module):
    """Logit-level concat after two full towers (ref: DML_Hong.py:142-224)."""

    n_bands1: int
    n_bands2: int
    n_classes: int

    @nn.compact
    def __call__(self, hsi, lidar, train: bool = False):
        f = _FILTERS

        def tower(x, name):
            x = _Stem(name="stem_" + name)(x, train)
            x = ConvBNReLU(f[3], (1, 1), padding=0, name="c5_" + name)(x, train)
            x = ConvBNReLU(f[2], (1, 1), padding=0, name="c6_" + name)(x, train)
            return adaptive_avg_pool(x)

        x1 = tower(hsi, "a")
        x2 = tower(lidar, "b")
        x = jnp.concatenate([x1, x2], axis=-1)
        return nn.Dense(self.n_classes, kernel_init=kaiming_out)(x)


class Cross_fusion_CNN(nn.Module):
    """Weight-shared cross-modal paths, three logit sets
    (ref: DML_Hong.py:226-323)."""

    n_bands1: int
    n_bands2: int
    n_classes: int

    @nn.compact
    def __call__(self, hsi, lidar, train: bool = False):
        f = _FILTERS
        x1 = _Stem(upto4=False, name="stem_a")(hsi, train)
        x2 = _Stem(upto4=False, name="stem_b")(lidar, train)

        # shared stage-4 convs applied cross-modally (ref: :292-299)
        conv4_a = ConvBNReLU(f[3], (1, 1), padding=0, name="conv4_a")
        conv4_b = ConvBNReLU(f[3], (1, 1), padding=0, name="conv4_b")
        x11 = max_pool_same(conv4_a(x1, train))
        x22 = max_pool_same(conv4_b(x2, train))
        x12 = max_pool_same(conv4_b(x1, train))
        x21 = max_pool_same(conv4_a(x2, train))

        j1 = jnp.concatenate([x11 + x21, x22 + x12], axis=-1)
        j2 = jnp.concatenate([x11, x12], axis=-1)
        j3 = jnp.concatenate([x22, x21], axis=-1)

        head = _JointHead(self.n_classes, name="joint_head")
        return head(j1, train), head(j2, train), head(j3, train)
