"""Mamba mixer layer and the multi-directional vision-Mamba backbone.

Capability parity with the reference's ``hsiMamba``
(ref: Mutimodality_Mamba7.py:176-1032), whose per-layer mixer is
HuggingFace ``MambaMixer`` configured with hidden=embed_dims, state=16,
intermediate=feedforward_channels, conv_kernel=4, time_step_rank=
ceil(embed/16), use_conv_bias=True, use_bias=False
(ref: :313-326). The mixer pipeline:

  in_proj -> (u, gate); causal depthwise Conv1d(k=4) -> SiLU;
  x_proj -> (dt, B, C); dt_proj -> softplus; selective scan (state 16);
  y * SiLU(gate) -> out_proj.

The backbone applies the mixer over D re-orderings of the token sequence
concatenated on the batch axis through ONE shared pre-LN + mixer, inverse-
permutes, and combines with a learned softmax gate over directions
(ref: :608-701 for '81_2+8'). Orderings come from
:mod:`vit_cnn_tpu.ops.scan_paths` (generated, verified against the
reference tables). The selective scan itself is the Pallas kernel in
:mod:`vit_cnn_tpu.ops.selective_scan`.

Init note (QUIRKS.md): the reference instantiates MambaMixer directly, so
HF's special dt initialization never runs and torch Linear defaults apply;
we use the standard Mamba dt init (documented divergence).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.scan_paths import inverse_permutation, path_orderings
from ..ops.selective_scan import selective_scan_auto


class MambaMixer(nn.Module):
    hidden_size: int
    intermediate_size: int
    state_size: int = 16
    conv_kernel: int = 4
    time_step_rank: Optional[int] = None
    use_conv_bias: bool = True
    use_bias: bool = False
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        b, L, _ = x.shape
        d = self.intermediate_size
        n = self.state_size
        tsr = self.time_step_rank or math.ceil(self.hidden_size / 16)

        proj = nn.Dense(2 * d, use_bias=self.use_bias, name="in_proj")(x)
        u, gate = jnp.split(proj, 2, axis=-1)

        # causal depthwise conv along tokens (left-pad k-1)
        u = nn.Conv(d, (self.conv_kernel,), padding=[(self.conv_kernel - 1, 0)],
                    feature_group_count=d, use_bias=self.use_conv_bias,
                    name="conv1d")(u)
        u = nn.silu(u)

        ssm = nn.Dense(tsr + 2 * n, use_bias=False, name="x_proj")(u)
        dt, B, C = jnp.split(ssm, [tsr, tsr + n], axis=-1)

        # dt projection with Mamba init (dt in [1e-3, 1e-1])
        dt_std = tsr ** -0.5

        def dt_bias_init(key, shape, dtype=jnp.float32):
            dt0 = jnp.exp(jax.random.uniform(key, shape) *
                          (math.log(0.1) - math.log(0.001)) + math.log(0.001))
            dt0 = jnp.maximum(dt0, 1e-4)
            return dt0 + jnp.log(-jnp.expm1(-dt0))

        dt = nn.Dense(d, use_bias=True,
                      kernel_init=nn.initializers.uniform(scale=2 * dt_std),
                      bias_init=dt_bias_init, name="dt_proj")(dt)
        dt = nn.softplus(dt)

        def a_log_init(key, shape, dtype=jnp.float32):
            return jnp.log(jnp.broadcast_to(
                jnp.arange(1, n + 1, dtype=jnp.float32)[None], shape))

        A_log = self.param("A_log", a_log_init, (d, n))
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (d,))

        y = selective_scan_auto(u, dt, A, B, C, D,
                                use_pallas=self.use_pallas)
        y = y * nn.silu(gate)
        return nn.Dense(self.hidden_size, use_bias=self.use_bias,
                        name="out_proj")(y)


class DirectionalMambaBackbone(nn.Module):
    """Token backbone: 1x1-conv patch embed + learnable pos embed + layers of
    (multi-directional gathers -> shared pre-LN + MambaMixer -> inverse
    gathers -> learned softmax gate over directions) + residual + final LN.

    out_type 'featmap' returns (B, H, W, C); 'avg_featmap' mean-pools tokens
    through a second LN (ref: :992-1032).
    """

    embed_dims: int
    num_layers: int
    feedforward_channels: int
    img_size: int
    in_channels: int
    path_type: str = "81_2+8"
    out_type: str = "featmap"
    drop_rate: float = 0.0
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C); 1x1 conv patch embed, bias-free (ref: :247-258)
        b, h, w, _ = x.shape
        x = nn.Conv(self.embed_dims, (1, 1), use_bias=False,
                    name="patch_embed")(x)
        tokens = x.reshape(b, h * w, self.embed_dims)
        L = h * w

        pos = self.param("pos_embed",
                         nn.initializers.truncated_normal(0.02),
                         (1, L, self.embed_dims))
        tokens = tokens + pos
        tokens = nn.Dropout(self.drop_rate, deterministic=not train)(tokens)

        orders = path_orderings(self.path_type, L)
        perms = jnp.asarray(np.stack(orders))                   # (D, L)
        inv_perms = jnp.asarray(np.stack(
            [inverse_permutation(o) for o in orders]))          # (D, L)
        n_dir = len(orders)

        for i in range(self.num_layers):
            residual = tokens
            # (D, B, L, C): gather all orderings, fold into batch
            gathered = tokens[:, perms].transpose(1, 0, 2, 3)
            folded = gathered.reshape(n_dir * b, L, self.embed_dims)
            folded = nn.LayerNorm(epsilon=1e-6, name=f"pre_norm{i}")(folded)
            mixed = MambaMixer(self.embed_dims, self.feedforward_channels,
                               use_pallas=self.use_pallas,
                               name=f"mixer{i}")(folded)
            mixed = mixed.reshape(n_dir, b, L, self.embed_dims)
            # undo each ordering: out[d, :, inv_perm[d]] position gather
            unmixed = jnp.take_along_axis(
                mixed, inv_perms[:, None, :, None], axis=2)

            # learned softmax gate over directions: zeros-init weights
            # (1, D, 1) through softmax (ref: :360, :694-701)
            gate_w = self.param(f"gate{i}", nn.initializers.zeros,
                                (1, n_dir, 1))
            gate = nn.softmax(gate_w, axis=1)                   # (1, D, 1)
            combined = jnp.einsum("dblc,xdy->blc", unmixed, gate)
            tokens = residual + combined
            if i == self.num_layers - 1:
                tokens = nn.LayerNorm(epsilon=1e-6, name="ln1")(tokens)

        if self.out_type == "featmap":
            return tokens.reshape(b, h, w, self.embed_dims)
        if self.out_type == "avg_featmap":
            return nn.LayerNorm(epsilon=1e-6,
                                name="ln2")(tokens.mean(axis=1))
        return tokens  # raw
