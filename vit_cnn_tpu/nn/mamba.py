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
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.scan_paths import (base_paths, inverse_permutation,
                              path_orderings, path_spec)
from ..ops.selective_scan import selective_scan_auto
from ..utils.envflags import kernel_gate


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


class CausalDWConv(nn.Module):
    """Depthwise causal conv along tokens, with a fused anti-causal mode.

    Parameter tree identical to the ``nn.Conv(features, (k,), padding=
    [(k-1, 0)], feature_group_count=features)`` it replaces (kernel
    (k, 1, features), bias (features,)), so transplanted checkpoints load
    unchanged. ``reverse=True`` computes ``flip(conv(flip(x)))`` as ONE
    right-padded conv with flipped taps: the two jnp.flip copies of the
    widened activation cost ~2x the conv itself on TPU (flip-conv-flip
    8.46 ms vs anti-causal 5.42 ms at the flagship chunk, 2026-08-17).
    """
    features: int
    kernel_size: int = 4
    use_bias: bool = True

    @nn.compact
    def __call__(self, x=None, reverse: bool = False,
                 lane_major: bool = False):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, 1, self.features))
        if x is None:
            # params-only mode: the fused directional kernel
            # (ops/dirstream.py) consumes the raw taps/bias directly
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,)) if self.use_bias else None)
            return kernel, bias
        if reverse:
            kernel = jnp.flip(kernel, axis=0)
        pad = [(0, k - 1)] if reverse else [(k - 1, 0)]
        # lane_major: x is (L, d, b) — the scan kernel's native layout;
        # the conv runs in place via WCN dimension_numbers (no transpose)
        dn = ("WCN", "WIO", "WCN") if lane_major else ("NWC", "WIO", "NWC")
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1,), padding=pad,
            feature_group_count=self.features, dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            bias = bias[None, :, None] if lane_major else bias
            y = y + bias.astype(y.dtype)
        return y


class DualLayoutDense(nn.Module):
    """nn.Dense twin (identical param tree: kernel (in, out) + optional
    bias) that can also apply in the scan kernel's lane-major layout —
    (L, in, b) -> (L, out, b) via one einsum, so the projection's output
    materializes directly in the layout the Pallas scan consumes
    (perf/mixer_lane_sweep.py: this removes the stage HBM transposes)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, lane_major: bool = False):
        in_dim = x.shape[-2] if lane_major else x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (in_dim, self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        if lane_major:
            # (..., in, b) -> (..., out, b): works for (L, in, b) and the
            # 4D directional-stream (ns, L, in, b)
            y = jnp.einsum("...cb,ck->...kb", x, kernel.astype(x.dtype))
            if bias is not None:
                y = y + bias.astype(y.dtype)[None, :, None]
            return y
        y = x @ kernel.astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


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
        u = CausalDWConv(d, self.conv_kernel, use_bias=self.use_conv_bias,
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


def permute_tokens(x, perms):
    """(B, L, C) -> (nb, B, L, C) with out[n, b, l] = x[b, perms[n, l]].

    In bf16 the permutation runs as a ONE-HOT MXU MATMUL: each output
    element is selected by a single unit coefficient, so the result is
    BIT-EXACT, and it measures 2.3x faster than the gather HLO at the
    flagship's widened shape (7.2 vs 16.8 ms, perf/gather_mm 2026-08-17).
    f32 keeps the gather: TPU f32 matmuls decompose into bf16 passes
    (rel err ~4e-3 — not exact), and the f32 one-hot is only 1.5x.
    """
    if x.dtype == jnp.bfloat16:
        P = jax.nn.one_hot(perms, x.shape[1], dtype=x.dtype)   # (nb, L, L)
        return jnp.einsum("nls,bsc->nblc", P, x)
    return x[:, perms].transpose(1, 0, 2, 3)


def unpermute_sum(combined, inv_perms):
    """sum_n combined[n, :, inv_perms[n], :] -> (B, L, C): the inverse
    scatter of every direction AND the direction sum, fused.

    In bf16 both collapse into one one-hot matmul (exact selection, f32
    accumulation via preferred_element_type keeps the 10-way direction sum
    out of bf16); f32 keeps take_along_axis + sum (see permute_tokens)."""
    if combined.dtype == jnp.bfloat16:
        P = jax.nn.one_hot(inv_perms, combined.shape[2],
                           dtype=combined.dtype)               # (nb, L, L)
        return jnp.einsum("nls,nbsc->blc", P, combined,
                          preferred_element_type=jnp.float32
                          ).astype(combined.dtype)
    unscattered = jnp.take_along_axis(
        combined, inv_perms[:, None, :, None], axis=2)
    return jnp.sum(unscattered, axis=0)


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

    def _direction_weights(self, spec, n_dir):
        """Per-direction combine weights (shared by both layout paths)."""
        if spec.combine == "softmax10":
            # the reference's self.weights is ALWAYS a 10-slot parameter
            # softmaxed over all 10 slots, of which the first n_dir are
            # used (ref: :360 + :607/:700/:970)
            gate_w = self.param("direction_gate", nn.initializers.zeros,
                                (10,))
            return nn.softmax(gate_w)[:n_dir]
        if spec.combine == "raw10":
            # eight_directions_gate applies NO softmax (ref: :514-515)
            gate_w = self.param("direction_gate", nn.initializers.zeros,
                                (10,))
            return gate_w[:n_dir]
        if spec.combine == "mean":
            return jnp.full((n_dir,), 1.0 / n_dir)
        return jnp.ones((n_dir,))                             # 'none'

    def _shuffle_key(self):
        """Per-call random permutation key (torch.randperm upstream draws
        from the ambient RNG on every forward, train AND eval,
        ref: :445,:950,:973). Uses the 'shuffle' rng stream when supplied;
        falls back to a fixed key so eval without rngs stays runnable."""
        if self.has_rng("shuffle"):
            return self.make_rng("shuffle")
        return jax.random.PRNGKey(0)

    @nn.compact
    def __call__(self, x):
        b, L, _ = x.shape
        d = self.intermediate_size
        n = self.state_size
        tsr = self.time_step_rank or math.ceil(self.hidden_size / 16)
        spec = path_spec(self.path_type)

        orders, bases, fwd_dir, rev_dir = base_paths(self.path_type, L)
        n_static = len(orders)
        n_dir = n_static + spec.n_shuffle
        rev_rows = [i for i, r in enumerate(rev_dir) if r >= 0]

        # static gather-once bases, plus dynamic shuffle streams appended
        # as extra bases (their permutation is drawn per call)
        perm_parts, inv_parts = [], []
        if bases:
            perm_parts.append(jnp.asarray(
                np.stack([orders[i] for i in bases])))
            inv_parts.append(jnp.asarray(
                np.stack([inverse_permutation(orders[i]) for i in bases])))
        for k in range(spec.n_shuffle):
            sp = jax.random.permutation(self._shuffle_key(), L)
            perm_parts.append(sp[None])
            inv_parts.append(jnp.argsort(sp)[None])
        perms = jnp.concatenate(perm_parts, axis=0)           # (nb, L)
        inv_perms = jnp.concatenate(inv_parts, axis=0)
        nb = len(bases) + spec.n_shuffle
        # direction index served by each base's forward scan
        fwd_dir_all = list(fwd_dir) + [n_static + k
                                       for k in range(spec.n_shuffle)]

        proj = nn.Dense(2 * d, use_bias=self.use_bias, name="in_proj")(x)
        u, gate = jnp.split(proj, 2, axis=-1)                 # (B, L, d)

        conv = CausalDWConv(d, self.conv_kernel,
                            use_bias=self.use_conv_bias, name="conv1d")
        x_proj = DualLayoutDense(tsr + 2 * n, use_bias=False, name="x_proj")
        dt_std = tsr ** -0.5
        dt_proj = DualLayoutDense(d, use_bias=True,
                                  kernel_init=nn.initializers.uniform(
                                      scale=2 * dt_std),
                                  bias_init=_dt_bias_init, name="dt_proj")
        A_log = self.param("A_log", _a_log_init(n), (d, n))
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (d,))

        # ---- lane-major fused-direction fast path ----------------------
        # The whole directional pipeline runs in the Pallas kernels'
        # (L, ch, batch) layout with the direction axis explicit:
        # ONE fused kernel does every static permute + causal/anti-causal
        # depthwise conv + SiLU from a single HBM read of u
        # (ops/dirstream.py — replaces the one-hot permute matmuls, the
        # two XLA convs and their HBM round-trips), the projections
        # contract in-layout, the scan consumes the 4D stream block
        # without any transpose (lane_major_io), and a second fused
        # kernel does the weighted inverse-permute direction sum with f32
        # accumulation. Exactly 2 layout transposes remain per layer
        # (u in, y out). bf16 + static orderings only (shuffle paths keep
        # the generic batch-major formulation).
        # default ON: the lane-major fused forward is hardware-verified
        # (round 2/3); the adjoints are separately gated by
        # VCT_DIRSTREAM_FUSED_BWD (default ON since round 5's in-step
        # A/B win) — see utils/envflags.py
        lane = (self.use_pallas and spec.combine != "dynamic"
                and spec.n_shuffle == 0
                and u.dtype == jnp.bfloat16
                and kernel_gate("VCT_LANE_MAJOR", "1"))
        if lane:
            from ..ops.dirstream import dir_conv_silu, inv_perm_weighted_sum

            u_lm = jnp.transpose(u, (1, 2, 0))                # (L, d, B)
            cwk, cbb = conv(None)
            cw = cwk[:, 0, :]
            cb = cbb if cbb is not None else jnp.zeros((d,), cwk.dtype)
            orders_t = tuple(tuple(int(v) for v in orders[i])
                             for i in bases)
            inv_t = tuple(tuple(int(v) for v in
                                inverse_permutation(orders[i]))
                          for i in bases)
            rr = tuple(rev_rows)
            uf, ur = dir_conv_silu(u_lm, cw.astype(u_lm.dtype),
                                   cb.astype(u_lm.dtype), orders_t, rr)

            def ssm_inputs_lane(uc):
                ssm = x_proj(uc, lane_major=True)
                dt, B_, C_ = jnp.split(ssm, [tsr, tsr + n], axis=-2)
                dt = nn.softplus(dt_proj(dt, lane_major=True))
                return dt, B_, C_

            dtf, Bf, Cf = ssm_inputs_lane(uf)
            y_fwd = selective_scan_auto(uf, dtf, A, Bf, Cf, D,
                                        use_pallas=self.use_pallas,
                                        lane_major_io=True)  # (nb,L,d,B)
            if rev_rows:
                dtr, Br, Cr = ssm_inputs_lane(ur)
                y_rev = selective_scan_auto(ur, dtr, A, Br, Cr, D,
                                            use_pallas=self.use_pallas,
                                            reverse=True,
                                            lane_major_io=True)
                w = self._direction_weights(spec, n_dir)
                wr = w[jnp.asarray([rev_dir[i] for i in rev_rows])]
            else:
                y_rev = jnp.zeros((0,) + y_fwd.shape[1:], y_fwd.dtype)
                w = self._direction_weights(spec, n_dir)
                wr = jnp.zeros((0,), w.dtype)
            wf = w[jnp.asarray(fwd_dir_all)]
            y = inv_perm_weighted_sum(y_fwd, y_rev, wf, wr, inv_t, rr)
            y = jnp.transpose(y, (2, 0, 1))                   # (B, L, d)
            out_proj = nn.Dense(self.hidden_size, use_bias=self.use_bias,
                                name="out_proj")
            y = y * nn.silu(gate)
            return out_proj(y)

        # ---- generic path ----------------------------------------------
        # permute u once per base ordering, fold into batch (one-hot MXU
        # matmul in bf16, gather in f32 — see permute_tokens)
        u_g = permute_tokens(u, perms)                        # (nb, B, L, d)
        u_g = u_g.reshape(nb * b, L, d)

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

        y_rev = None
        if rev_rows:
            # reverse twin: anti-causal conv (== causal conv on the flipped
            # sequence, flipped back — computed directly as a right-padded
            # conv with flipped taps, no activation flips) + back-to-front
            # scan on the SAME gathered data
            u_r = u_g.reshape(nb, b, L, d)[jnp.asarray(rev_rows)]
            u_r = u_r.reshape(len(rev_rows) * b, L, d)
            ur_conv = conv(u_r, reverse=True)
            ur, dtr, Br, Cr = ssm_inputs(ur_conv)
            y_rev = selective_scan_auto(ur, dtr, A, Br, Cr, D,
                                        use_pallas=self.use_pallas,
                                        reverse=True)
            y_rev = y_rev.reshape(len(rev_rows), b, L, d)

        out_proj = nn.Dense(self.hidden_size, use_bias=self.use_bias,
                            name="out_proj")

        if spec.combine == "dynamic":
            # per-sample gate over restored streams ('forward_reverse_gate',
            # ref: :936-947 — the only path using gate_layers). Token-means
            # commute with the inverse permutation; out_proj is linear and
            # bias-free, so the reference's "gate on full-mixer-output
            # means" equals out_proj applied to the gated-value means.
            restored = jnp.take_along_axis(
                y_fwd, inv_perms[:, None, :, None], axis=2)
            dirs = jnp.zeros((n_dir, b, L, d), y_fwd.dtype)
            dirs = dirs.at[jnp.asarray(fwd_dir_all)].set(restored)
            if y_rev is not None:
                restored_rev = jnp.take_along_axis(
                    y_rev, inv_perms[jnp.asarray(rev_rows)][:, None, :, None],
                    axis=2)
                dirs = dirs.at[jnp.asarray(
                    [rev_dir[i] for i in rev_rows])].set(restored_rev)
            g = dirs * nn.silu(gate)[None]                    # (n_dir,B,L,d)
            means = out_proj(g.mean(axis=2))                  # (n_dir,B,h)
            gate_in = jnp.concatenate(
                [means[i] for i in range(n_dir)], axis=-1)    # (B,n_dir*h)
            dyn = nn.softmax(nn.Dense(n_dir, use_bias=False,
                                      name="gate")(gate_in))  # (B,n_dir)
            y = jnp.einsum("nbld,bn->bld", g, dyn)
            return out_proj(y)

        w = self._direction_weights(spec, n_dir)
        combined = y_fwd * w[jnp.asarray(fwd_dir_all)][:, None, None, None]
        if y_rev is not None:
            w_rev = w[jnp.asarray([rev_dir[i] for i in rev_rows])]
            combined = combined.at[jnp.asarray(rev_rows)].add(
                y_rev * w_rev[:, None, None, None])

        # one inverse scatter per base + the direction sum (fused into one
        # one-hot matmul in bf16 — see unpermute_sum)
        y = unpermute_sum(combined, inv_perms)                # (B, L, d)

        y = y * nn.silu(gate)
        return out_proj(y)


def sincos_2d_position_embedding(h: int, w: int, embed_dims: int,
                                 temperature: float = 10000.0) -> np.ndarray:
    """Fixed 2D sine-cosine position embedding, replicating
    ref: mmpretrain/models/utils/position_encoding.py:123-173 exactly
    (including its 'ij' meshgrid over (w, h), i.e. the w index varies
    slowest in the flattened token order)."""
    assert embed_dims % 4 == 0, "embed dims must be divisible by 4"
    grid_w, grid_h = np.meshgrid(np.arange(w, dtype=np.float32),
                                 np.arange(h, dtype=np.float32),
                                 indexing="ij")
    pos_dim = embed_dims // 4
    omega = 1.0 / temperature ** (
        np.arange(pos_dim, dtype=np.float32) / pos_dim)
    out_w = grid_w.reshape(-1)[:, None] * omega[None]
    out_h = grid_h.reshape(-1)[:, None] * omega[None]
    return np.concatenate([np.sin(out_w), np.cos(out_w),
                           np.sin(out_h), np.cos(out_h)],
                          axis=1)[None].astype(np.float32)


class DirectionalMambaBackbone(nn.Module):
    """Token backbone: 1x1-conv patch embed + pos embed + layers of
    (multi-directional gathers -> shared pre-LN + MambaMixer -> inverse
    gathers -> gated direction combine) + residual + final LN.

    The full hsiMamba capability surface (ref: :176-1032):

    * ``path_type``: every string the reference's forward accepts —
      'forward', 'shuffle', '{81,49}_2+8', 'eight_directions_gate',
      '{81,49,25,9}twoclock', 'forward_reverse_{mean,gate,shuffle_gate,
      shuffle_mean}' — plus 'multi_clock_gate' (the CLI's dead default,
      which matches NO branch upstream: the layer body is skipped and the
      residual add doubles the tokens; replicated, see QUIRKS.md).
    * ``pe_type``: 'learnable' (trunc-normal 0.02, ref: :377-378), 'sine'
      (fixed 2D sincos, ref: :287-293), or 'none'.
    * ``cls_position``: 'none' | 'head' | 'tail' | 'head_tail' | 'middle'
      (ref: :424-436; zeros-init token(s), 2 for head_tail). Grid path
      types require a square token count, so cls tokens combine only with
      the sequence-order paths — same constraint as upstream.
    * ``out_type``: 'featmap' (B,H,W,C) | 'avg_featmap' (LN'd token mean) |
      'cls_token' (by cls_position; head_tail averages both ends) | 'raw'
      (ref: :992-1032).
    """

    embed_dims: int
    num_layers: int
    feedforward_channels: int
    img_size: int
    in_channels: int
    path_type: str = "81_2+8"
    out_type: str = "featmap"
    pe_type: str = "learnable"
    cls_position: str = "none"
    drop_rate: float = 0.0
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C); 1x1 conv patch embed, bias-free (ref: :247-258)
        b, h, w, _ = x.shape
        x = nn.Conv(self.embed_dims, (1, 1), use_bias=False,
                    name="patch_embed")(x)
        tokens = x.reshape(b, h * w, self.embed_dims)

        n_extra = {"none": 0, "head": 1, "tail": 1, "middle": 1,
                   "head_tail": 2}[self.cls_position]
        if n_extra:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, n_extra, self.embed_dims))
            cls = jnp.broadcast_to(cls, (b, n_extra, self.embed_dims))
            if self.cls_position == "head":
                tokens = jnp.concatenate([cls, tokens], axis=1)
            elif self.cls_position == "tail":
                tokens = jnp.concatenate([tokens, cls], axis=1)
            elif self.cls_position == "head_tail":
                tokens = jnp.concatenate([cls[:, :1], tokens, cls[:, 1:]],
                                         axis=1)
            else:                                              # middle
                half = tokens.shape[1] // 2
                tokens = jnp.concatenate(
                    [tokens[:, :half], cls, tokens[:, half:]], axis=1)
        L = tokens.shape[1]

        if self.pe_type == "learnable":
            pos = self.param("pos_embed",
                             nn.initializers.truncated_normal(0.02),
                             (1, L, self.embed_dims))
            tokens = tokens + pos
        elif self.pe_type == "sine":
            # fixed, non-learned (ref: :287-293; cls extension is a TODO
            # upstream, so sine requires cls_position='none' — same here)
            assert n_extra == 0, "sine pos embed does not support cls tokens"
            tokens = tokens + jnp.asarray(
                sincos_2d_position_embedding(h, w, self.embed_dims))
        tokens = nn.Dropout(self.drop_rate, deterministic=not train)(tokens)

        identity = path_spec(self.path_type).identity
        for i in range(self.num_layers):
            residual = tokens
            if identity:
                # 'multi_clock_gate' matches no scan branch upstream: the
                # pre-norm/mixer are skipped and x = residual + x doubles
                # the tokens (ref: :441-987 fall-through + :987)
                tokens = residual + tokens
            else:
                # pre-LN hoisted before the directional gathers (LN is
                # per-token, so it commutes with every permutation)
                normed = nn.LayerNorm(epsilon=1e-6,
                                      name=f"pre_norm{i}")(tokens)
                mixed = MultiDirMambaLayer(
                    self.embed_dims, self.feedforward_channels,
                    path_type=self.path_type, use_pallas=self.use_pallas,
                    name=f"mixer{i}")(normed)
                tokens = residual + mixed
            if i == self.num_layers - 1:
                tokens = nn.LayerNorm(epsilon=1e-6, name="ln1")(tokens)

        if self.out_type == "raw":
            return tokens        # cls tokens included (ref: :993-994)

        if self.out_type == "cls_token":
            # ref: _format_output :995-1003
            if self.cls_position == "head":
                return tokens[:, 0]
            if self.cls_position == "tail":
                return tokens[:, -1]
            if self.cls_position == "head_tail":
                return (tokens[:, 0] + tokens[:, -1]) / 2
            if self.cls_position == "middle":
                return tokens[:, tokens.shape[1] // 2]
            raise ValueError("out_type=cls_token requires a cls_position")

        # strip cls tokens from patch-token outputs (ref: :1005-1016)
        if n_extra:
            if self.cls_position == "head":
                tokens = tokens[:, 1:]
            elif self.cls_position == "tail":
                tokens = tokens[:, :-1]
            elif self.cls_position == "head_tail":
                tokens = tokens[:, 1:-1]
            else:                                              # middle
                half = tokens.shape[1] // 2
                tokens = jnp.concatenate(
                    [tokens[:, :half], tokens[:, half + 1:]], axis=1)

        if self.out_type == "featmap":
            return tokens.reshape(b, h, w, self.embed_dims)
        assert self.out_type == "avg_featmap"
        return nn.LayerNorm(epsilon=1e-6, name="ln2")(tokens.mean(axis=1))
