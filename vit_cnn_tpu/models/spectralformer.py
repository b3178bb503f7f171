"""SpectralFormer: band-sequence transformer over single pixels (patch=1).

Capability parity with ref: model/compare_method/spectralformer.py:111-156:
each of the 144 HSI bands + 1 LiDAR band of the center pixel becomes one
token (patch_dim = 1), linearly embedded to dim 64; a CLS token + learned
positional embedding feed a 5-deep ViT ('ViT' wiring); classification reads
the CLS token through LayerNorm + Linear. The reference also constructs
CAF skipcat convs that 'ViT' mode never uses (dead params, omitted here).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.transformer import ViTBackbone
from .base import squeeze_pixel


class SpectralFormer(nn.Module):
    num_patches: int          # n_bands1 + n_bands2
    n_classes: int
    dim: int = 64
    depth: int = 5
    heads: int = 4
    dim_head: int = 16
    mlp_dim: int = 8
    dropout: float = 0.1
    emb_dropout: float = 0.1
    mode: str = "ViT"
    near_band: int = 1

    @nn.compact
    def __call__(self, hsi, lidar, train: bool = False):
        x1 = squeeze_pixel(hsi)[..., None]    # (B, C1, 1)
        x2 = squeeze_pixel(lidar)[..., None]  # (B, C2, 1)
        x = jnp.concatenate([x1, x2], axis=1)  # (B, N, 1): one token per band
        x = nn.Dense(self.dim, name="patch_to_embedding")(x)
        b, n, _ = x.shape

        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x],
                            axis=1)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, self.num_patches + 1, self.dim))
        x = x + pos[:, : n + 1]
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        x = ViTBackbone(self.dim, self.depth, self.heads, self.dim_head,
                        self.mlp_dim, self.dropout, self.mode,
                        num_tokens=n + 1, name="transformer")(x, train)
        cls_out = nn.LayerNorm(epsilon=1e-5, name="head_norm")(x[:, 0])
        return nn.Dense(self.n_classes, name="head")(cls_out)
