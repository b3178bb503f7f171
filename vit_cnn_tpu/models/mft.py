"""MFT: multimodal fusion transformer.

Capability parity with ref: model/compare_method/MFT.py:131-214:

* HSI stem: Conv3d(1->8, kernel (9,3,3), valid on bands, SAME spatially)
  -> reshape -> HetConv (grouped 3x3 + pointwise 1x1) -> 64ch,
* LiDAR stem: Conv2d(->64) + BN + GELU,
* learned tokenization: softmax(X wA^T)^T @ (X wV) -> 4 HSI tokens and one
  LiDAR token (ref: :189-207),
* 2 transformer blocks whose attention queries ONLY token 0
  (``MCrossAttention``, ref: :28-59) — per-head q/k/v project head_dim ->
  dim, and the (B, 1, C) attention output is broadcast-added to all tokens
  (ref: :97-101, a reference quirk kept for parity),
* classifier on the encoded token 0.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import BatchNorm

xavier_uniform = nn.initializers.xavier_uniform()
xavier_normal = nn.initializers.xavier_normal()
tiny_normal = nn.initializers.normal(stddev=1e-6)


class _HetConv(nn.Module):
    """Grouped 3x3 conv + pointwise conv, summed (ref: MFT.py:15-25)."""

    features: int
    groups: int

    @nn.compact
    def __call__(self, x):
        gwc = nn.Conv(self.features, (3, 3), padding=1,
                      feature_group_count=self.groups, name="gwc")(x)
        pwc = nn.Conv(self.features, (1, 1), name="pwc")(x)
        return gwc + pwc


class _MCrossAttention(nn.Module):
    """Cross attention with q = token 0; head projections head_dim -> dim."""

    dim: int
    num_heads: int = 8
    proj_drop: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        scale = hd ** -0.5
        xh = x.reshape(b, n, h, hd)
        q = nn.Dense(self.dim, use_bias=False, name="wq")(
            xh[:, 0:1]).transpose(0, 2, 1, 3)          # (B, H, 1, dim)
        k = nn.Dense(self.dim, use_bias=False, name="wk")(
            xh).transpose(0, 2, 1, 3)                  # (B, H, N, dim)
        v = nn.Dense(self.dim, use_bias=False, name="wv")(
            xh).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)   # (B, H, 1, dim)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, self.dim * h)
        out = nn.Dense(self.dim, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out                                      # (B, 1, dim)


class _Mlp(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(512, kernel_init=xavier_uniform,
                     bias_init=tiny_normal)(x)
        x = nn.gelu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = nn.Dense(self.dim, kernel_init=xavier_uniform,
                     bias_init=tiny_normal)(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return x


class _Block(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        y = nn.LayerNorm(epsilon=1e-6)(x)
        y = _MCrossAttention(self.dim)(y, train)
        x = y + h  # (B,1,C) broadcast onto (B,N,C) — reference quirk
        h = x
        y = nn.LayerNorm(epsilon=1e-6)(x)
        y = _Mlp(self.dim)(y, train)
        return y + h


def _tokenize(x, wa, wv):
    """softmax((x wa^T)^T) @ (x wv): learned token pooling
    (ref: MFT.py:189-207). x: (B, N, C); wa: (T, C); wv: (C, C)."""
    a = jnp.einsum("bnc,tc->bnt", x, wa)
    a = nn.softmax(a.transpose(0, 2, 1), axis=-1)       # (B, T, N)
    vv = jnp.einsum("bnc,cd->bnd", x, wv)
    return jnp.einsum("btn,bnd->btd", a, vv)            # (B, T, C)


class MFT(nn.Module):
    patch_size: int
    fm: int
    n_bands1: int
    n_bands2: int
    n_classes: int

    @nn.compact
    def __call__(self, hsi, lidar, train: bool = False):
        b, p, _, nc = hsi.shape
        dim = self.fm * 4  # 64

        # Conv3d(1->8, (9,3,3)): bands valid, space SAME. NDHWC layout.
        x1 = hsi.transpose(0, 3, 1, 2)[..., None]        # (B, NC, P, P, 1)
        x1 = nn.Conv(8, (9, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                     name="conv5")(x1)                   # (B, NC-8, P, P, 8)
        x1 = BatchNorm(use_running_average=not train, name="bn5")(x1)
        x1 = nn.relu(x1)
        # flatten (8, NC-8) 8-major, matching the reference's channel order
        # (ref: MFT.py:183 reshape) so the grouped HetConv partitions the
        # same channel sets
        x1 = x1.transpose(0, 2, 3, 4, 1).reshape(b, p, p, -1)

        cin = 8 * (nc - 8)
        g = dim // 4 if cin % self.fm == 0 else dim // 8
        x1 = _HetConv(dim, g, name="conv6")(x1)
        x1 = BatchNorm(use_running_average=not train, name="bn6")(x1)
        x1 = nn.relu(x1)

        x2 = nn.Conv(64, (3, 3), padding=1, name="lidar_conv")(lidar)
        x2 = BatchNorm(use_running_average=not train, name="lidar_bn")(x2)
        x2 = nn.gelu(x2)

        seq1 = x1.reshape(b, p * p, dim)
        seq2 = x2.reshape(b, p * p, 64)

        wa = self.param("token_wA", xavier_normal, (4, 64))
        wv = self.param("token_wV", xavier_normal, (64, 64))
        wa_l = self.param("token_wA_L", xavier_normal, (1, 64))
        wv_l = self.param("token_wV_L", xavier_normal, (64, 64))

        t_hsi = _tokenize(seq1, wa, wv)                  # (B, 4, 64)
        t_lidar = _tokenize(seq2, wa_l, wv_l)            # (B, 1, 64)

        x = jnp.concatenate([t_lidar, t_hsi], axis=1)    # (B, 5, 64)
        pos = self.param("position_embeddings",
                         nn.initializers.normal(1.0), (1, 5, dim))
        x = x + pos
        x = nn.Dropout(0.1, deterministic=not train)(x)

        for i in range(2):
            x = _Block(dim, name=f"block{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, name="encoder_norm")(x)
        cls = x[:, 0]
        return nn.Dense(self.n_classes, kernel_init=xavier_uniform,
                        bias_init=tiny_normal, name="out3")(cls)
