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

from ..ops.scan_paths import base_paths, inverse_permutation, path_orderings
from ..ops.selective_scan import selective_scan_auto


def _dt_bias_init(key, shape, dtype=jnp.float32):
    """Standard Mamba dt bias init: softplus^-1 of dt ~ LogUniform[1e-3,.1]."""
    dt0 = jnp.exp(jax.random.uniform(key, shape) *
                  (math.log(0.1) - math.log(0.001)) + math.log(0.001))
    dt0 = jnp.maximum(dt0, 1e-4)
    return dt0 + jnp.log(-jnp.expm1(-dt0))


def _a_log_init(n):
    def init(key, shape, dtype=jnp.float32):
        return jnp.log(jnp.broadcast_to(
            jnp.arange(1, n + 1, dtype=jnp.float32)[None], shape))

    return init


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
        dt = nn.Dense(d, use_bias=True,
                      kernel_init=nn.initializers.uniform(scale=2 * dt_std),
                      bias_init=_dt_bias_init, name="dt_proj")(dt)
        dt = nn.softplus(dt)

        A_log = self.param("A_log", _a_log_init(n), (d, n))
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (d,))

        y = selective_scan_auto(u, dt, A, B, C, D,
                                use_pallas=self.use_pallas)
        y = y * nn.silu(gate)
        return nn.Dense(self.hidden_size, use_bias=self.use_bias,
                        name="out_proj")(y)


class MultiDirMambaLayer(nn.Module):
    """One multi-directional Mamba layer: the mixer pipeline applied over D
    re-orderings of the tokens with a learned softmax gate over directions
    (ref: Mutimodality_Mamba7.py:608-701) — restructured for TPU:

    * The order-INDEPENDENT ops (in_proj, the post-scan gate, out_proj, and
      the direction-weighted sum) commute with the permutations, so they
      run ONCE on (B, L, ·) instead of on the D-fold widened batch: ~10x
      fewer projection FLOPs and 2x(C/d)x less gather traffic than the
      literal formulation (only ``u``, d channels, is ever permuted).
    * Orderings that are exact reverses of another share one gather: the
      reverse direction is served by scanning the base's sequence
      back-to-front (selective_scan reverse=True) and inverse-scattering
      with the base's inverse permutation — 10 directions cost 6 gathers
      ('81_2+8'/'49_2+8': 4 fwd/rev pairs + 2 spirals).

    Parameter set identical to one shared :class:`MambaMixer`
    (ref: :313-326 config) plus the (n_dir,) direction gate (ref: :360).
    """

    hidden_size: int
    intermediate_size: int
    path_type: str
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

        orders, bases, fwd_dir, rev_dir = base_paths(self.path_type, L)
        n_dir = len(orders)
        nb = len(bases)
        perms = jnp.asarray(np.stack([orders[i] for i in bases]))
        inv_perms = jnp.asarray(np.stack(
            [inverse_permutation(orders[i]) for i in bases]))
        rev_rows = [i for i, r in enumerate(rev_dir) if r >= 0]

        proj = nn.Dense(2 * d, use_bias=self.use_bias, name="in_proj")(x)
        u, gate = jnp.split(proj, 2, axis=-1)                 # (B, L, d)

        # gather u once per base ordering, fold into batch
        u_g = u[:, perms].transpose(1, 0, 2, 3)               # (nb, B, L, d)
        u_g = u_g.reshape(nb * b, L, d)

        conv = nn.Conv(d, (self.conv_kernel,),
                       padding=[(self.conv_kernel - 1, 0)],
                       feature_group_count=d, use_bias=self.use_conv_bias,
                       name="conv1d")
        x_proj = nn.Dense(tsr + 2 * n, use_bias=False, name="x_proj")
        dt_std = tsr ** -0.5
        dt_proj = nn.Dense(d, use_bias=True,
                           kernel_init=nn.initializers.uniform(
                               scale=2 * dt_std),
                           bias_init=_dt_bias_init, name="dt_proj")
        A_log = self.param("A_log", _a_log_init(n), (d, n))
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (d,))

        def ssm_inputs(uc):
            uc = nn.silu(uc)
            ssm = x_proj(uc)
            dt, B_, C_ = jnp.split(ssm, [tsr, tsr + n], axis=-1)
            dt = nn.softplus(dt_proj(dt))
            return uc, dt, B_, C_

        # forward stream: causal conv + forward scan over every base
        uf, dtf, Bf, Cf = ssm_inputs(conv(u_g))
        y_fwd = selective_scan_auto(uf, dtf, A, Bf, Cf, D,
                                    use_pallas=self.use_pallas)
        y_fwd = y_fwd.reshape(nb, b, L, d)

        # direction gate (softmax over all D directions, zeros-init)
        gate_w = self.param("direction_gate", nn.initializers.zeros,
                            (n_dir,))
        w = nn.softmax(gate_w)

        combined = y_fwd * w[jnp.asarray(fwd_dir)][:, None, None, None]

        if rev_rows:
            # reverse twin: anti-causal conv (causal conv on the flipped
            # sequence, flipped back) + back-to-front scan on the SAME
            # gathered data
            u_r = u_g.reshape(nb, b, L, d)[jnp.asarray(rev_rows)]
            u_r = u_r.reshape(len(rev_rows) * b, L, d)
            ur_conv = jnp.flip(conv(jnp.flip(u_r, axis=1)), axis=1)
            ur, dtr, Br, Cr = ssm_inputs(ur_conv)
            y_rev = selective_scan_auto(ur, dtr, A, Br, Cr, D,
                                        use_pallas=self.use_pallas,
                                        reverse=True)
            y_rev = y_rev.reshape(len(rev_rows), b, L, d)
            w_rev = w[jnp.asarray([rev_dir[i] for i in rev_rows])]
            combined = combined.at[jnp.asarray(rev_rows)].add(
                y_rev * w_rev[:, None, None, None])

        # one inverse scatter per base, then the direction sum
        unscattered = jnp.take_along_axis(
            combined, inv_perms[:, None, :, None], axis=2)
        y = jnp.sum(unscattered, axis=0)                      # (B, L, d)

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

        for i in range(self.num_layers):
            residual = tokens
            # pre-LN hoisted before the directional gathers (LN is
            # per-token, so it commutes with every permutation)
            normed = nn.LayerNorm(epsilon=1e-6, name=f"pre_norm{i}")(tokens)
            mixed = MultiDirMambaLayer(
                self.embed_dims, self.feedforward_channels,
                path_type=self.path_type, use_pallas=self.use_pallas,
                name=f"mixer{i}")(normed)
            tokens = residual + mixed
            if i == self.num_layers - 1:
                tokens = nn.LayerNorm(epsilon=1e-6, name="ln1")(tokens)

        if self.out_type == "featmap":
            return tokens.reshape(b, h, w, self.embed_dims)
        if self.out_type == "avg_featmap":
            return nn.LayerNorm(epsilon=1e-6,
                                name="ln2")(tokens.mean(axis=1))
        return tokens  # raw
