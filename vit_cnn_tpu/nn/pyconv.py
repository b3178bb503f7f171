"""Pyramidal convolutions (PyConv): parallel convs at multiple kernel sizes
whose outputs concatenate along channels.

Mirrors ref: model/compare_method/MHST/PyConv2D.py (PyConv2/3/4 +
get_pyconv): each branch is a bias-free grouped conv with SAME padding
(kernel // 2) and out_channels = planes // out_planes_div[i].
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class PyConv(nn.Module):
    planes: int
    kernels: Sequence[int]
    out_planes_div: Sequence[int]
    groups: Sequence[int]
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, (k, d, g) in enumerate(zip(self.kernels, self.out_planes_div,
                                          self.groups)):
            outs.append(nn.Conv(self.planes // d, (k, k),
                                strides=(self.strides, self.strides),
                                padding=k // 2, feature_group_count=g,
                                use_bias=False, name=f"branch{i}")(x))
        if len(outs) == 1:
            return outs[0]
        return jnp.concatenate(outs, axis=-1)
