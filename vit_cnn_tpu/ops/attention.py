"""Fused attention kernel for the zoo's tiny sequences.

Every attention in the reference zoo runs on short token streams —
SpectralFormer 146, MHST 65, MFT/HCTnet <=7, NonLocal <=81
(SURVEY.md §2.3 row "cuBLAS matmul + softmax") — at large effective batch
(patch count x heads). XLA lowers softmax(QK^T)V as two MXU matmul fusions
with the (G, L, L) score tensor round-tripping through HBM between them;
at G ~ 10^5 that HBM traffic dominates. This kernel keeps scores in VMEM:
one grid cell loads a block of sequences and does QK^T -> softmax -> PV
in-register.

Layout: q (G, Lq, dh), k/v (G, Lk, dh) with G = batch*heads folded.
Backward uses XLA's differentiation of the unfused reference formula
(scores are recomputed — flash-style, nothing saved but q/k/v).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_reference(q, k, v, scale: float):
    """Unfused formula (XLA path + autodiff rule for the kernel)."""
    s = jnp.einsum("gid,gjd->gij", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("gij,gjd->gid", p, v)


def _make_kernel(scale: float):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[...].astype(jnp.float32)
        k = k_ref[...].astype(jnp.float32)
        v = v_ref[...].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,)))) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))))
        o_ref[...] = o.astype(o_ref.dtype)

    return kernel


def _pallas_attention(q, k, v, scale: float, block_g: int):
    g, lq, dh = q.shape
    lk = k.shape[1]
    pad = (-g) % block_g
    if pad:
        z = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        q, k, v = z(q), z(k), z(v)
    gt = q.shape[0]

    spec = lambda L, ch: pl.BlockSpec((block_g, L, ch),
                                      lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        _make_kernel(scale),
        grid=(gt // block_g,),
        in_specs=[spec(lq, dh), spec(lk, dh), spec(lk, dh)],
        out_specs=spec(lq, dh),
        out_shape=jax.ShapeDtypeStruct((gt, lq, dh), q.dtype),
    )(q, k, v)
    return o[:g]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, scale: float, block_g: int = 16):
    """softmax(q k^T * scale) v with scores kept in VMEM."""
    return _pallas_attention(q, k, v, scale, block_g)


def _fa_fwd(q, k, v, scale, block_g):
    return _pallas_attention(q, k, v, scale, block_g), (q, k, v)


def _fa_bwd(scale, block_g, res, g):
    q, k, v = res
    _, vjp = jax.vjp(partial(attention_reference, scale=scale), q, k, v)
    return vjp(g)


fused_attention.defvjp(_fa_fwd, _fa_bwd)


def attention_reference_heads(q, k, v, scale: float,
                              residual: bool = False):
    """Head-last unfused formula: q/k/v (B, n, h, hd) -> (B, n, h, hd).

    This is exactly the einsum/softmax/einsum the MHST pooled attention
    (ref: HSPT.py:142-290) computes; kept as the XLA fallback and the
    autodiff rule for the fused kernel. ``residual``: MViT residual
    pooling — add q to every non-first (non-CLS) token's output."""
    s = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bjhd->bihd", p, v)
    if residual:
        o = o.at[:, 1:].add(q[:, 1:])
    return o


def _make_heads_kernel(scale: float, h: int, hd: int, residual: bool):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        # Full-width MASKED dots: S_h = q @ (k * lane_mask_h)^T is a
        # healthy (n, h*hd)@(h*hd, n) MXU contraction — the mask zeroes
        # the other heads' channels so the wide dot sums only head h —
        # and O = sum_h P_h @ (v * lane_mask_h) lands each head's output
        # in its own lanes. Per-head narrow (n, hd) dots measured 7.6 ms
        # vs 6.0 ms for this at the MHST shape; lane concatenates and
        # (bb, n, n, c) product tensors crash Mosaic outright
        # (perf/mhst_attn_variants.py).
        q = q_ref[...]
        k = k_ref[...]
        v = v_ref[...]
        bb, n, c = q.shape
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (bb, n, c), 2) // hd
        acc = jnp.zeros((bb, n, c), jnp.float32)
        for i in range(h):
            kh = jnp.where(lane_head == i, k, jnp.zeros_like(k))
            s = jax.lax.dot_general(
                q, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale   # (bb, n, n)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
            vh = jnp.where(lane_head == i, v, jnp.zeros_like(v))
            acc = acc + jax.lax.dot_general(
                p, vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        if residual:
            # MViT residual pooling: out += q on every NON-FIRST token
            # (row 0 is CLS; ref: HSPT.py:275-280) — folded here because
            # XLA's .at[:, 1:].add is a 4 ms dynamic-update-slice pass
            row = jax.lax.broadcasted_iota(jnp.int32, (bb, n, c), 1)
            acc = acc + jnp.where(row >= 1, q, jnp.zeros_like(q)
                                  ).astype(jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)

    return kernel


def _auto_heads_block_g(n: int):
    """Largest safe batch block for the heads kernel at sequence length n,
    or None when no block fits and the caller must fall back to the XLA
    reference formula.

    Scoped VMEM is dominated by the f32 (block_g, n, n) score/softmax
    chain, modeled as ~9 such live buffers (36*g*n*n bytes). Calibration:
    block_g=32 at n=146 OOM'd scoped VMEM on the chip 2026-08-19
    (perf/logs/pooled_check_r4_oom_block32.log — the remote-compile HTTP
    500 preserved there does not echo the VMEM figure, so the exact
    overshoot is observed-not-preserved), while n=65 at block_g=32
    compiles and is hardware-verified fast. Budget ~11M, power-of-two,
    clamped to [8, 32]; when even block_g=8 exceeds the budget
    (n >= ~196) return None rather than hand Mosaic a doomed compile."""
    g = 11_000_000 // (36 * n * n)
    if g < 8:
        return None
    p = 8
    while p * 2 <= min(g, 32):
        p *= 2
    return p


def _pallas_attention_heads(q, k, v, scale: float, block_g,
                            residual: bool = False):
    b, n, h, hd = q.shape
    if block_g is None:
        block_g = _auto_heads_block_g(n)
        if block_g is None:
            raise ValueError(
                f"fused_attention_heads: no VMEM-safe block at n={n} "
                "(36*8*n*n exceeds the ~11M scoped budget) — use "
                "attention_reference_heads, or pass block_g explicitly "
                "to override")
    fold = lambda t: t.reshape(b, n, h * hd)
    qf, kf, vf = fold(q), fold(k), fold(v)
    pad = (-b) % block_g
    if pad:
        z = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        qf, kf, vf = z(qf), z(kf), z(vf)
    bt = qf.shape[0]
    spec = pl.BlockSpec((block_g, n, h * hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        _make_heads_kernel(scale, h, hd, residual),
        grid=(bt // block_g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bt, n, h * hd), q.dtype),
    )(qf, kf, vf)
    return o[:b].reshape(b, n, h, hd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_heads(q, k, v, scale: float, block_g=None,
                          residual: bool = False):
    """Head-last multi-head attention with per-head scores kept in VMEM.

    For MANY tiny heads (MHST: 16 heads of hd=4 over 65 tokens) XLA's
    lowering of the head-folded einsum round-trips the (B, h, n, n)
    score tensor through HBM (plus separate softmax passes) — measured
    8.9 ms per 4096x16-head call, ~28.5 ms for the whole module, where
    the traffic bound is ~0.2 ms (perf/profile_mhst.py,
    perf/mhst_attn_variants.py). This kernel loads a block of batch rows
    once, runs all heads' QK^T/softmax/PV (and optionally the MViT +q
    residual on non-CLS tokens) in VMEM, one HBM pass over q/k/v/o.
    block_g=None picks the largest VMEM-safe batch block for the
    sequence length (_auto_heads_block_g): 32 at the hardware-verified
    65-token shapes, 8 at the 146-token SpectralFormer/S2EFT shape
    whose f32 score chain OOMs scoped VMEM at 32 (and >32 overflows
    even at 65 tokens: Mosaic does not reuse buffers across the
    unrolled head iterations)."""
    return _pallas_attention_heads(q, k, v, scale, block_g, residual)


def _fah_fwd(q, k, v, scale, block_g, residual):
    return (_pallas_attention_heads(q, k, v, scale, block_g, residual),
            (q, k, v))


def _fah_bwd(scale, block_g, residual, res, g):
    q, k, v = res
    _, vjp = jax.vjp(partial(attention_reference_heads, scale=scale,
                             residual=residual), q, k, v)
    return vjp(g)


fused_attention_heads.defvjp(_fah_fwd, _fah_bwd)


def fused_attention_heads_auto(q, k, v, scale: float, block_g=None,
                               residual: bool = False):
    """Pallas heads kernel on TPU; head-last reference formula elsewhere
    (including on TPU when no VMEM-safe block exists for this seq len)."""
    if jax.default_backend() == "tpu":
        bg = block_g if block_g is not None else _auto_heads_block_g(
            q.shape[1])
        if bg is not None:
            return fused_attention_heads(q, k, v, scale, bg, residual)
    return attention_reference_heads(q, k, v, scale, residual)


def ln_groups_reference(x, gamma, beta, hd: int, eps: float = 1e-5):
    """LayerNorm over trailing hd-sized channel groups of (B, n, c) — the
    per-(token, head) LN of the MHST pooled attention, with flax
    LayerNorm's exact recipe (normalization.py): f32 stats, fast variance
    E[x^2]-E[x]^2 clipped at 0, scale/bias of shape (hd,) shared across
    heads."""
    b, n, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, n, c // hd, hd)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.reshape(b, n, c).astype(x.dtype)


def ln_groups_matmul(x, gamma, beta, hd: int, eps: float = 1e-5):
    """Reshape-free hd-group LayerNorm: group stats via one block-diagonal
    averaging matmul on the MXU (pure XLA, no Mosaic).

    ln_groups_reference's (b, n, c//hd, hd) reshape splits the lane axis —
    a relayout XLA cannot fuse, ~2 ms per module at the MHST serving
    shape. Here mean = x @ M with M[i, j] = 1/hd iff lanes i, j share a
    group: for bf16 x the products are EXACT in the MXU (bf16 * 0.25 with
    f32 accumulation), so the group mean equals the reference's f32 mean
    of the same bf16 values bit-for-bit. Variance uses the centered form
    E[(x-mu)^2] (no E[x^2]-mu^2 cancellation); d*d rounds once through
    bf16, a ~0.5% relative error on var — below bf16 forward noise. Only
    used for bf16 inputs (the serving dtype); callers keep the reference
    for f32 parity paths."""
    b, n, c = x.shape
    lane = jnp.arange(c)
    same = (lane[:, None] // hd) == (lane[None, :] // hd)
    m = same.astype(x.dtype) / hd
    dot = lambda a: jax.lax.dot_general(
        a, m, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    mu = dot(x)
    d = x.astype(jnp.float32) - mu
    var = jnp.maximum(dot(d.astype(x.dtype) * d.astype(x.dtype)), 0.0)
    h = c // hd
    g = jnp.tile(gamma.astype(jnp.float32), h)
    bta = jnp.tile(beta.astype(jnp.float32), h)
    y = d * jax.lax.rsqrt(var + eps) * g + bta
    return y.astype(x.dtype)


def pooled_attention_reference(q, k, v, ln_q, ln_k, ln_v, h: int,
                               scale: float, residual: bool = True):
    """Unfused composition: per-head-group LN on q/k/v, then head-last
    attention with the MViT +q(post-LN) residual on non-CLS tokens
    (ref: HSPT.py:142-290). q/k/v (B, n, c); ln_* = (scale, bias) of
    shape (c//h,). XLA fallback + autodiff rule for the fused kernel."""
    b, n, c = q.shape
    hd = c // h
    qn = ln_groups_reference(q, *ln_q, hd)
    kn = ln_groups_reference(k, *ln_k, hd)
    vn = ln_groups_reference(v, *ln_v, hd)
    heads = lambda t: t.reshape(b, n, h, hd)
    o = attention_reference_heads(heads(qn), heads(kn), heads(vn), scale,
                                  residual)
    return o.reshape(b, n, c)


def _make_pooled_kernel(scale: float, h: int, hd: int, residual: bool,
                        eps: float = 1e-5):
    def kernel(q_ref, k_ref, v_ref, gq_ref, bq_ref, gk_ref, bk_ref,
               gv_ref, bv_ref, gdn_ref, gup_ref, o_ref):
        # gdn (c, h): lane -> head one-hot scaled by 1/hd (group MEAN via
        # one MXU dot); gup (h, c): broadcast back. The (bb, n, 16, 4)
        # reshape XLA needs for these stats is a lane-splitting relayout
        # and cannot fuse into the pallas_call boundary — in-kernel the
        # group stats are two small dots and the LN'd q/k/v never touch
        # HBM.
        gdn = gdn_ref[...]
        gup = gup_ref[...]

        def ln(x_ref, g_ref, b_ref):
            x = x_ref[...].astype(jnp.float32)
            mu = jax.lax.dot_general(
                jax.lax.dot_general(x, gdn, (((2,), (0,)), ((), ()))),
                gup, (((2,), (0,)), ((), ())))
            sq = jax.lax.dot_general(
                jax.lax.dot_general(x * x, gdn, (((2,), (0,)), ((), ()))),
                gup, (((2,), (0,)), ((), ())))
            var = jnp.maximum(sq - mu * mu, 0.0)
            y = (x - mu) * jax.lax.rsqrt(var + eps)
            return (y * g_ref[...] + b_ref[...]).astype(q_ref.dtype)

        q = ln(q_ref, gq_ref, bq_ref)
        k = ln(k_ref, gk_ref, bk_ref)
        v = ln(v_ref, gv_ref, bv_ref)
        bb, n, c = q.shape
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (bb, n, c), 2) // hd
        acc = jnp.zeros((bb, n, c), jnp.float32)
        for i in range(h):
            kh = jnp.where(lane_head == i, k, jnp.zeros_like(k))
            s = jax.lax.dot_general(
                q, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
            vh = jnp.where(lane_head == i, v, jnp.zeros_like(v))
            acc = acc + jax.lax.dot_general(
                p, vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        if residual:
            row = jax.lax.broadcasted_iota(jnp.int32, (bb, n, c), 1)
            acc = acc + jnp.where(row >= 1, q, jnp.zeros_like(q)
                                  ).astype(jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)

    return kernel


def _auto_pooled_block_g(n: int, h: int) -> int:
    """VMEM-safe batch block for the LN-fold pooled kernel.

    Hardware-measured scoped footprint: 30.65M at block_g=32, n=65,
    h=16 (2026-08-19 AOT OOM vs the 16M limit) — the 16 unrolled head
    iterations plus the three LN chains do not share buffers, so the
    footprint scales ~ block_g * n^2 * h. Budget ~11M, power-of-two,
    clamped [4, 32]."""
    g = int(11e6 * 32 * 65 * 65 * 16 / (30.65e6 * n * n * h))
    p = 4
    while p * 2 <= min(g, 32):
        p *= 2
    return p


def _pallas_pooled(q, k, v, gq, bq, gk, bk, gv, bv, h, scale, block_g,
                   residual):
    b, n, c = q.shape
    hd = c // h
    if block_g is None:
        block_g = _auto_pooled_block_g(n, h)
    pad = (-b) % block_g
    if pad:
        z = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        q, k, v = z(q), z(k), z(v)
    bt = q.shape[0]
    lane = jnp.arange(c)
    gdn = ((lane[:, None] // hd) == jnp.arange(h)[None, :]
           ).astype(jnp.float32) / hd
    gup = (gdn.T > 0).astype(jnp.float32)
    tile = lambda p: jnp.tile(p.astype(jnp.float32), h).reshape(1, c)
    spec = pl.BlockSpec((block_g, n, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    fix = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                 memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        _make_pooled_kernel(scale, h, hd, residual),
        grid=(bt // block_g,),
        in_specs=[spec, spec, spec] + [fix((1, c))] * 6 +
                 [fix((c, h)), fix((h, c))],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bt, n, c), q.dtype),
    )(q, k, v, tile(gq), tile(bq), tile(gk), tile(bk), tile(gv), tile(bv),
      gdn, gup)
    return o[:b]


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def pooled_heads_attention(q, k, v, gq, bq, gk, bk, gv, bv, h: int,
                           scale: float, block_g=None,
                           residual: bool = True):
    """Fused per-head-group LN + multi-head attention + MViT residual.

    One VMEM pass over the MHST pooled-attention tail: the three LNs over
    hd-sized groups (whose lane-splitting reshapes otherwise materialize
    at the kernel boundary), all heads' QK^T/softmax/PV via full-width
    masked dots, and the +q residual on non-CLS rows."""
    return _pallas_pooled(q, k, v, gq, bq, gk, bk, gv, bv, h, scale,
                          block_g, residual)


def _pha_fwd(q, k, v, gq, bq, gk, bk, gv, bv, h, scale, block_g, residual):
    out = _pallas_pooled(q, k, v, gq, bq, gk, bk, gv, bv, h, scale,
                         block_g, residual)
    return out, (q, k, v, gq, bq, gk, bk, gv, bv)


def _pha_bwd(h, scale, block_g, residual, res, g):
    q, k, v, gq, bq, gk, bk, gv, bv = res
    _, vjp = jax.vjp(
        lambda q, k, v, gq, bq, gk, bk, gv, bv: pooled_attention_reference(
            q, k, v, (gq, bq), (gk, bk), (gv, bv), h, scale, residual),
        q, k, v, gq, bq, gk, bk, gv, bv)
    return vjp(g)


pooled_heads_attention.defvjp(_pha_fwd, _pha_bwd)


def pooled_heads_attention_auto(q, k, v, ln_q, ln_k, ln_v, h: int,
                                scale: float, block_g=None,
                                residual: bool = True):
    """Fused LN+attention+residual kernel behind VCT_POOLED_ATTN.

    Default OFF — **documented rejection** (2026-08-19 hardware gate,
    perf/logs/pooled_check_r4c_blk8.log): at the VMEM-safe block_g=8
    the kernel finally compiles on the real chip but (a) MISCOMPILES —
    max|diff| 6.5e+1 vs the reference composition, despite exact
    interpret-mode parity on CPU (Mosaic bug, likely in the broadcast
    (1, c) LN-param blocks or the f32 (c, h)/(h, c) group-mean dots) —
    and (b) at 13.4 ms is slower than the verified middle path below.
    Do not flip this default without BOTH a numerics pass and a timing
    win at the gate.

    The gated-off TPU path is NOT pure XLA: it composes the XLA hd-group
    LNs with `fused_attention_heads(residual=...)`, which IS
    Mosaic-verified at the MHST serving shape (6.0 ms vs 8.9 ms for the
    XLA attention core, perf/mhst_attn_variants.py) — so MHST keeps the
    verified kernel win whatever the pooled gate's outcome (VERDICT r3
    #2/#3). Off-TPU it is the pure reference composition.
    """
    from ..utils.envflags import kernel_gate

    if kernel_gate("VCT_POOLED_ATTN", "0"):
        return pooled_heads_attention(q, k, v, ln_q[0], ln_q[1], ln_k[0],
                                      ln_k[1], ln_v[0], ln_v[1], h, scale,
                                      block_g, residual)
    if jax.default_backend() == "tpu":
        b, n, c = q.shape
        hd = c // h
        # matmul-stat LN (reshape-free, bf16 serving dtype only): pure
        # XLA, perf gate. Default OFF — measured REJECTION (2026-08-19,
        # perf/ln_groups_probe.py on the chip): standalone 3.10->2.99 ms
        # but in the full middle path only 12.34->12.26 ms (0.7%, inside
        # run noise) — XLA already overlaps the reshape-LN chains with
        # the attention kernel's HBM traffic, so the standalone win
        # doesn't survive context. Kept for documentation + the probe.
        ln_fn = (ln_groups_matmul
                 if q.dtype == jnp.bfloat16
                 and kernel_gate("VCT_LN_GROUPS_MM", "0")
                 else ln_groups_reference)
        heads = lambda t, ln: ln_fn(t, *ln, hd).reshape(b, n, h, hd)
        o = fused_attention_heads(heads(q, ln_q), heads(k, ln_k),
                                  heads(v, ln_v), scale, block_g, residual)
        return o.reshape(b, n, c)
    return pooled_attention_reference(q, k, v, ln_q, ln_k, ln_v, h, scale,
                                      residual)


def fused_attention_auto(q, k, v, scale: float, block_g: int = 16):
    """Pallas kernel on TPU; reference formula elsewhere.

    Accepts (G, L, dh) or (B, H, L, dh); returns the same rank it got.
    """
    squeeze = q.ndim == 4
    if squeeze:
        b, h, lq, dh = q.shape
        fold = lambda t: t.reshape(b * h, t.shape[2], t.shape[3])
        q, k, v = fold(q), fold(k), fold(v)
    if jax.default_backend() == "tpu":
        o = fused_attention(q, k, v, scale, block_g)
    else:
        o = attention_reference(q, k, v, scale)
    if squeeze:
        o = o.reshape(b, h, lq, dh)
    return o
