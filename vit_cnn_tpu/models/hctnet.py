"""HCTnet: hierarchical cross-token transformer for HSI+LiDAR.

Capability parity with ref: model/compare_method/HCTnet.py:224-367:

* HSI stem: Conv3d(1->8, 3x3x3 valid) -> flatten bands into channels ->
  Conv2d(->64, 3x3 valid); LiDAR stem: Conv2d(->64, 3x3 valid),
* learned tokenization with token_wA/(wV) SHARED across modalities
  (ref: :326-340) producing num_tokens tokens each,
* shared zero-init CLS + pos embedding (std .02),
* FusionEncoder (ref: :175-203): per-modality transformer (attention
  scaled by dim^-0.5, qkv bias) then CT_Transformer exchanging CLS tokens
  cross-modally (kv includes self, dim_head 64),
* shared LayerNorm+Linear head applied to both CLS tokens and summed.

Quirk repaired (QUIRKS.md): the reference's conv2d_features declares
in_channels=8, but its own 3D stem produces 8*(bands-2) channels (the
working value survives in a comment, ref: :261-262); we use 8*(bands-2).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import BatchNorm
from .mft import _tokenize

xavier_normal = nn.initializers.xavier_normal()
kaiming_in = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class _Attention(nn.Module):
    """Self-attention scaled by dim^-0.5 (ref: HCTnet.py:56-94)."""

    dim: int
    heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, _ = x.shape
        h = self.heads
        hd = self.dim // h
        qkv = nn.Dense(self.dim * 3, use_bias=True, kernel_init=kaiming_in,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim ** -0.5)
        attn = nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, kernel_init=kaiming_in, name="nn1")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _MLPBlock(nn.Module):
    dim: int
    hidden: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden, kernel_init=kaiming_in)(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim, kernel_init=kaiming_in)(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class _Transformer(nn.Module):
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        for l in range(self.depth):
            x = x + _Attention(self.dim, self.heads, self.dropout,
                               name=f"attn{l}")(
                nn.LayerNorm(epsilon=1e-5, name=f"attn_norm{l}")(x), train)
            x = x + _MLPBlock(self.dim, self.mlp_dim, self.dropout,
                              name=f"mlp{l}")(
                nn.LayerNorm(epsilon=1e-5, name=f"mlp_norm{l}")(x), train)
        return x


class _CTAttention(nn.Module):
    """Cross-token attention: q from CLS, kv from (self + context)
    (ref: HCTnet.py:96-131)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, context, train: bool = False):
        b = x.shape[0]
        h = self.heads
        inner = self.heads * self.dim_head
        context = jnp.concatenate([x, context], axis=1)  # kv includes self
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_of(t):
            return t.reshape(b, t.shape[1], h, self.dim_head).transpose(
                0, 2, 1, 3)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head ** -0.5)
        attn = nn.softmax(dots, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, x.shape[1], inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class HCTnet(nn.Module):
    n_bands1: int
    n_bands2: int
    n_classes: int
    num_tokens: int = 4
    dim: int = 64
    heads: int = 8
    mlp_dim: int = 8
    depth: int = 1
    dropout: float = 0.1
    emb_dropout: float = 0.1
    ct_attn_dim_head: int = 64

    @nn.compact
    def __call__(self, hsi, lidar, train: bool = False):
        b, p, _, nc = hsi.shape

        # 3D stem (valid): NDHWC with bands as depth
        x1 = hsi.transpose(0, 3, 1, 2)[..., None]          # (B, NC, P, P, 1)
        x1 = nn.Conv(8, (3, 3, 3), padding="VALID", kernel_init=kaiming_in,
                     name="conv3d")(x1)                    # (B, NC-2, P-2, P-2, 8)
        x1 = BatchNorm(use_running_average=not train, name="bn3d")(x1)
        x1 = nn.relu(x1)
        d, s = x1.shape[1], x1.shape[2]
        # flatten (8, NC-2) depth-major, matching the reference's
        # 'b c h w y -> b (c h) w y' channel order (ref: HCTnet.py:324)
        x1 = x1.transpose(0, 2, 3, 4, 1).reshape(b, s, s, 8 * d)
        x1 = nn.Conv(64, (3, 3), padding="VALID", name="conv2d")(x1)
        x1 = BatchNorm(use_running_average=not train, name="bn2d")(x1)
        x1 = nn.relu(x1)

        x2 = nn.Conv(64, (3, 3), padding="VALID", name="conv2d_l")(lidar)
        x2 = BatchNorm(use_running_average=not train, name="bn2d_l")(x2)
        x2 = nn.relu(x2)

        seq1 = x1.reshape(b, -1, 64)
        seq2 = x2.reshape(b, -1, 64)

        # shared tokenization across modalities (ref: :326-340)
        wa = self.param("token_wA", xavier_normal, (self.num_tokens, self.dim))
        wv = self.param("token_wV", xavier_normal, (self.dim, self.dim))
        t1 = _tokenize(seq1, wa, wv)
        t2 = _tokenize(seq2, wa, wv)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, self.num_tokens + 1, self.dim))
        x1 = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), t1],
                             axis=1) + pos
        x2 = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), t2],
                             axis=1) + pos
        drop = nn.Dropout(self.emb_dropout, deterministic=not train)
        x1, x2 = drop(x1), drop(x2)

        # fusion encoder (ref: :175-203)
        for l in range(self.depth):
            x1 = _Transformer(self.dim, 1, self.heads, self.mlp_dim,
                              self.dropout, name=f"h_enc{l}")(x1, train)
            x2 = _Transformer(self.dim, 1, self.heads, self.mlp_dim,
                              self.dropout, name=f"l_enc{l}")(x2, train)
            h_cls, h_patch = x1[:, :1], x1[:, 1:]
            l_cls, l_patch = x2[:, :1], x2[:, 1:]
            h_cls = h_cls + _CTAttention(
                self.dim, self.heads, self.ct_attn_dim_head, self.dropout,
                name=f"ct_h{l}")(nn.LayerNorm(epsilon=1e-5, name=f"ct_h_norm{l}")(h_cls),
                                 l_patch, train)
            l_cls = l_cls + _CTAttention(
                self.dim, self.heads, self.ct_attn_dim_head, self.dropout,
                name=f"ct_l{l}")(nn.LayerNorm(epsilon=1e-5, name=f"ct_l_norm{l}")(l_cls),
                                 h_patch, train)
            x1 = jnp.concatenate([h_cls, h_patch], axis=1)
            x2 = jnp.concatenate([l_cls, l_patch], axis=1)

        head_norm = nn.LayerNorm(epsilon=1e-5, name="head_norm")
        head = nn.Dense(self.n_classes, kernel_init=kaiming_in, name="head")
        return head(head_norm(x1[:, 0])) + head(head_norm(x2[:, 0]))
