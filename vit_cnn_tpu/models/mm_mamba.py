"""Multimodality_Mamba — the reference's flagship model, TPU-native.

Capability parity with ref: model/Multimodality_Mamba/Mutimodality_Mamba7.py
(:1141-1181 top level, :1050-1091 GlobalLocalBlock, :51-64 TokenLearner,
:66-159 NonLocal, :1093-1139 fusion blocks) plus the missing
``model.changer.ChannelExchange`` (Changer-paper semantics: swap every
other channel when channel counts match, ref guard :1134-1135).

Dataflow (patch 9, Houston2013 channel plan [144, 256, 144] / LiDAR
[1, 16, 32] / fusion 128, ref: :1145-1147):

  hsi1 = GlobalLocalBlock(9, 144->256)     # 9x9 -> 7x7
  hsi2 = GlobalLocalBlock(7, 256->144)     # 7x7 -> 5x5
  lidar1/2 = BN->valid 3x3 conv->ReLU      # 9->7->5
  fusion_k = fusionBlock(hsi_k, lidar_k)   # ChannelExchange-guarded concat
  logits = Linear(128, K)(avgpool(f1) + avgpool(f2))

GlobalLocalBlock: global path = DirectionalMambaBackbone ('81_2+8' /
'49_2+8' multi-directional selective scan, Pallas kernel) -> 1x1 conv ->
TokenLearner -> LN; local path = valid 3x3; channel path = 1x1 conv ->
TokenLearner -> LN; GLfusionBlock (NonLocal cross-attention) then
fusionBlock merge.

Notes vs reference (QUIRKS.md): the ctor's ``path_type`` is dead upstream
(hardcoded '81_2+8'/'49_2+8', ref: :1053-1066) — same here; the backbone
embedding width follows in_channels so non-144-band datasets work.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import BatchNorm
from ..nn.mamba import DirectionalMambaBackbone


class TokenLearner(nn.Module):
    """S spatial-attention heads -> S tokens (ref: :26-64).

    Implemented as one fused conv with S output channels — mathematically
    identical to the reference's S separate Conv2d(2, 1) heads, but one
    MXU-friendly op instead of a Python loop over modules (and without the
    hardcoded "cuda:0" buffer, ref: :60).
    """

    num_tokens: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C)
        mx = jnp.max(x, axis=-1, keepdims=True)
        avg = jnp.mean(x, axis=-1, keepdims=True)
        combined = jnp.concatenate([mx, avg], axis=-1)       # (B, H, W, 2)
        fmap = nn.Conv(self.num_tokens, (1, 1), name="conv")(combined)
        fmap = BatchNorm(use_running_average=not train, name="bn")(fmap)
        fmap = nn.relu(fmap)
        weight = nn.sigmoid(fmap)                            # (B, H, W, S)
        return jnp.einsum("bhwc,bhws->bsc", x, weight) / (
            x.shape[1] * x.shape[2])


class NonLocalBlock2D(nn.Module):
    """theta/phi/g 1x1-conv non-local cross attention with 2x2-maxpool
    subsampling of phi/g and a zero-init BN on the output projection
    (ref: :66-159)."""

    in_channels: int
    sub_sample: bool = True

    @nn.compact
    def __call__(self, x, y, z, train: bool = False):
        inter = max(self.in_channels // 2, 1)
        b, h, w, _ = x.shape

        theta = nn.Conv(inter, (1, 1), name="theta")(x)       # (B, h, w, i)
        phi = nn.Conv(inter, (1, 1), name="phi")(y)
        g = nn.Conv(inter, (1, 1), name="g")(z)
        if self.sub_sample:
            phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
            g = nn.max_pool(g, (2, 2), strides=(2, 2))

        tq = theta.reshape(b, h * w, inter)
        tk = phi.reshape(b, -1, inter)
        tv = g.reshape(b, -1, inter)
        # NOTE: the reference applies raw (unscaled) softmax here
        from ..ops.attention import fused_attention_auto

        o = fused_attention_auto(tq, tk, tv, 1.0).reshape(b, h, w, inter)

        o = nn.Conv(self.in_channels, (1, 1), name="W_conv")(o)
        o = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=nn.initializers.zeros,
                         name="W_bn")(o)
        return o + z


def channel_exchange(x1, x2, p: int = 2):
    """Swap every p-th channel between two maps (Changer paper; the
    reference imports this from the missing ``model.changer``)."""
    c = x1.shape[-1]
    mask = (jnp.arange(c) % p) == 0
    out1 = jnp.where(mask, x2, x1)
    out2 = jnp.where(mask, x1, x2)
    return out1, out2


class MsConvBNReLU(nn.Module):
    """BN -> valid conv -> ReLU (ref: :1035-1048; note BN comes first)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(use_running_average=not train)(x)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding="VALID")(x)
        return nn.relu(x)


class FusionBlock(nn.Module):
    """ChannelExchange (when channel counts match) -> concat -> 1x1 conv +
    BN + ReLU (ref: :1119-1139)."""

    out_channels: int

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        if x1.shape[-1] == x2.shape[-1]:
            x1, x2 = channel_exchange(x1, x2)
        x = jnp.concatenate([x1, x2], axis=-1)
        x = nn.Conv(self.out_channels, (1, 1))(x)
        x = BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class GLFusionBlock(nn.Module):
    """NonLocal cross-attention merge of channel/local features
    (ref: :1093-1117)."""

    out_channels: int

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        # x1: channel feature, x2: local feature
        globalf = x2 + x1
        localf = NonLocalBlock2D(x2.shape[-1], name="cross_attention")(
            x2, x1, x1, train) + x2
        x = jnp.concatenate([localf, globalf], axis=-1)
        x = nn.Conv(self.out_channels, (1, 1))(x)
        x = BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class GlobalLocalBlock(nn.Module):
    """Global (Mamba) + local (conv) + channel (TokenLearner) tri-path
    block; spatial side shrinks by 2 (ref: :1050-1091)."""

    img_size: int
    in_channels: int
    out_channels: int
    use_pallas: bool = True

    @nn.compact
    def __call__(self, hsi, train: bool = False):
        s = self.img_size
        path = "{}_2+8".format(s * s)
        inner = (s - 2) * (s - 2)

        gv = DirectionalMambaBackbone(
            embed_dims=self.in_channels, num_layers=1,
            feedforward_channels=self.in_channels // 2, img_size=s,
            in_channels=self.in_channels, path_type=path, out_type="featmap",
            use_pallas=self.use_pallas, name="global_view")(hsi, train)

        gf = nn.Conv(self.out_channels, (1, 1), name="change_dim")(gv)
        gf = TokenLearner(inner, name="global_tokens")(gf, train)
        gf = nn.LayerNorm(epsilon=1e-6, name="ln3")(gf)
        gf = gf.reshape(gf.shape[0], s - 2, s - 2, self.out_channels)

        local = MsConvBNReLU(self.out_channels, name="local_feature")(
            hsi, train)

        cf = nn.Conv(self.out_channels, (1, 1), name="channel_feature")(hsi)
        cf = TokenLearner(inner, name="channel_tokens")(cf, train)
        cf = nn.LayerNorm(epsilon=1e-6, name="ln4")(cf)
        cf = cf.reshape(cf.shape[0], s - 2, s - 2, self.out_channels)

        fused = GLFusionBlock(self.out_channels, name="gl_fusion")(
            cf, local, train)
        return FusionBlock(self.out_channels, name="fusion")(
            gf, fused, train)


class MultimodalityMamba(nn.Module):
    img_size: int
    in_channels1: int
    in_channels2: int
    dim_embedding: int
    n_classes: int
    use_pallas: bool = True

    @nn.compact
    def __call__(self, hsi, lidar, train: bool = False):
        plane_hsi = (self.in_channels1, 256, self.in_channels1)
        plane_lidar = (self.in_channels2, 16, 32)
        fusion_ch = 128

        hsi1 = GlobalLocalBlock(self.img_size, plane_hsi[0], plane_hsi[1],
                                self.use_pallas, name="hsi1")(hsi, train)
        hsi2 = GlobalLocalBlock(self.img_size - 2, plane_hsi[1],
                                plane_hsi[2], self.use_pallas,
                                name="hsi2")(hsi1, train)

        lidar1 = MsConvBNReLU(plane_lidar[1], name="lidar1")(lidar, train)
        lidar2 = MsConvBNReLU(plane_lidar[2], name="lidar2")(lidar1, train)

        f1 = FusionBlock(fusion_ch, name="fusion1")(hsi1, lidar1, train)
        f2 = FusionBlock(fusion_ch, name="fusion2")(hsi2, lidar2, train)

        feat = jnp.mean(f1, axis=(1, 2)) + jnp.mean(f2, axis=(1, 2))
        return nn.Dense(self.n_classes, name="classifier")(feat)
