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
