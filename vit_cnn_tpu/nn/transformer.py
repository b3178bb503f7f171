"""Shared ViT backbone: pre-norm residual attention/FF stack with optional
CAF cross-layer skip connections.

Mirrors the transformer used by both SpectralFormer and S2EFT
(ref: model/compare_method/spectralformer.py:7-109 and S2EFT.py:6-108):
multi-head attention with separate dim_head (inner_dim = heads * dim_head),
GELU feed-forward, and in 'CAF' mode a learned (1, 2) conv merging layer
l with layer l-2 across the token axis before each block from depth 2 on.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import fused_attention_auto, fused_attention_heads_auto


def _heads_routing_enabled() -> bool:
    """Gate the tiny-dim_head heads-kernel routing on TPU (VCT_HEADS_ATTN).

    Default ON: perf/pooled_kernel_check.py's heads section passed on
    the real chip 2026-08-19 (perf/logs/pooled_check_r4.log) at BOTH
    ViTBackbone routing shapes — (4096, 65, 4, 16) en_transformer
    3.89 -> 3.05 ms and (2048, 146, 4, 16) SpectralFormer/S2EFT
    5.71 -> 3.38 ms (the 146-token shape needed the n-aware batch block,
    ops/attention._auto_heads_block_g, after a scoped-VMEM OOM at the
    old fixed block_g=32). max|diff| 2.3e-2 / 1.6e-2 vs the XLA einsum
    at bf16. Set VCT_HEADS_ATTN=0 to fall back to the round-2 G-folded
    kernel. Off-TPU the routing is pure XLA reference math and stays on."""
    import jax

    from ..utils.envflags import kernel_gate

    if jax.default_backend() != "tpu":
        return True
    return kernel_gate("VCT_HEADS_ATTN", "1")


class ViTAttention(nn.Module):
    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        scale = self.dim_head ** -0.5
        if self.dim_head < 32 and _heads_routing_enabled():
            # tiny heads (MHST en_transformer: 4 heads of 16): the
            # G-folded kernel's (block, n, dim_head) VMEM layout wastes
            # 7/8 of the lanes; the head-last kernel keeps all h*hd
            # channels on the lanes and needs no (b,n,h,hd)<->(b,h,n,hd)
            # transposes
            hl = lambda t: t.reshape(b, n, self.heads, self.dim_head)
            out = fused_attention_heads_auto(hl(q), hl(k), hl(v), scale)
            out = out.reshape(b, n, inner)
        else:
            def heads(t):
                return t.reshape(b, n, self.heads, self.dim_head).transpose(
                    0, 2, 1, 3)

            q, k, v = heads(q), heads(k), heads(v)
            # fused Pallas kernel on TPU: scores never leave VMEM
            out = fused_attention_auto(q, k, v, scale)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim)(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class ViTBackbone(nn.Module):
    """depth x (prenorm attn + prenorm FF), 'ViT' or 'CAF' wiring."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    mode: str = "ViT"
    num_tokens: Optional[int] = None  # required for CAF skipcat convs

    @nn.compact
    def __call__(self, x, train: bool = False):
        outputs = []
        for l in range(self.depth):
            if self.mode == "CAF":
                outputs.append(x)
                if l > 1:
                    # merge layer l with layer l-2: (B, T, D, 2) -> (1,2)
                    # conv over the token axis (ref: spectralformer.py:98-107)
                    pair = jnp.stack([x, outputs[l - 2]], axis=-1)
                    b, t, d, _ = pair.shape
                    # torch Conv2d(T, T, (1, 2)): full mixing over tokens and
                    # the 2 source layers, shared across feature dim
                    w = self.param(f"skipcat{l - 2}",
                                   nn.initializers.lecun_normal(),
                                   (t, t * 2))
                    bias = self.param(f"skipcat{l - 2}_bias",
                                      nn.initializers.zeros, (t,))
                    flat = pair.transpose(0, 2, 1, 3).reshape(b, d, t * 2)
                    x = jnp.einsum("bdi,ti->bdt", flat, w) + bias
                    x = x.transpose(0, 2, 1)
            x = x + ViTAttention(self.dim, self.heads, self.dim_head,
                                 self.dropout,
                                 name=f"attn{l}")(
                nn.LayerNorm(epsilon=1e-5, name=f"attn_norm{l}")(x), train)
            x = x + FeedForward(self.dim, self.mlp_dim, self.dropout,
                                name=f"ff{l}")(
                nn.LayerNorm(epsilon=1e-5, name=f"ff_norm{l}")(x), train)
        return x
