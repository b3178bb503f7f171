"""S2EFT: spectral transformer with channel-attention gating and CAF
cross-layer skip connections.

Capability parity with ref: model/compare_method/S2EFT.py:110-162, with the
documented repairs (QUIRKS.md) — as wired in the reference the model cannot
run: the harness passes the LiDAR patch into ``mask`` (undefined ``F``),
``b, n, c = x.shape`` would reject 4-D input, and the CAF skipcat convs are
sized num_patches+2 for a num_patches+1 token stream. Here:

* tokens = HSI bands; each token's features are the patch pixels of
  ``near_band`` adjacent bands (patch_dim = P^2 * near_band, wrap-around),
* channel attention gate: mean/max over features -> Conv1d(2->1, k=7)
  over the band axis -> sigmoid -> hard threshold 0.4 multiplying tokens
  (ref: :135-145; gradient does not flow through the gate, as in torch),
* CLS + pos embedding, 5-deep CAF ViT, LayerNorm + Linear head,
* the LiDAR input is accepted and ignored (single-modality model).
"""

from __future__ import annotations

import jax
import flax.linen as nn
import jax.numpy as jnp

from ..nn.transformer import ViTBackbone


class S2EFT(nn.Module):
    num_patches: int      # n_bands1
    patch_size: int
    n_classes: int
    dim: int = 64
    depth: int = 5
    heads: int = 4
    dim_head: int = 16
    mlp_dim: int = 8
    dropout: float = 0.1
    emb_dropout: float = 0.1
    mode: str = "CAF"
    near_band: int = 3

    @nn.compact
    def __call__(self, hsi, lidar, train: bool = False):
        b, p, _, c = hsi.shape
        # band tokens with near_band adjacent-band context (wrap-around)
        x = hsi.reshape(b, p * p, c).transpose(0, 2, 1)  # (B, C, P*P)
        nb = self.near_band
        groups = [jnp.roll(x, -i, axis=1) for i in range(nb)]
        x = jnp.concatenate(groups, axis=-1)             # (B, C, P*P*nb)

        # channel attention gate (ref: S2EFT.py:135-145)
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        g = jnp.concatenate([avg, mx], axis=-1)          # (B, C, 2)
        g = nn.Conv(1, (7,), padding=3, name="gate_conv")(g)
        g = nn.sigmoid(g)                                # (B, C, 1)
        gate = jax.lax.stop_gradient((g >= 0.4).astype(x.dtype))
        x = x * gate

        x = nn.Dense(self.dim, name="patch_to_embedding")(x)
        n = x.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x],
                            axis=1)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, self.num_patches + 2, self.dim))
        x = x + pos[:, : n + 1]
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        x = ViTBackbone(self.dim, self.depth, self.heads, self.dim_head,
                        self.mlp_dim, self.dropout, self.mode,
                        num_tokens=n + 1, name="transformer")(x, train)
        cls_out = nn.LayerNorm(name="head_norm")(x[:, 0])
        return nn.Dense(self.n_classes, name="head")(cls_out)
