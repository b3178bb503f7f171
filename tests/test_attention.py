"""Fused attention kernel (ops/attention.py): reference equivalence via the
Pallas TPU interpreter, gradients, rank-4 folding."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_cnn_tpu.ops.attention import (attention_reference,
                                       attention_reference_heads,
                                       fused_attention,
                                       fused_attention_auto,
                                       fused_attention_heads,
                                       fused_attention_heads_auto)


def _qkv(key, g=6, lq=9, lk=7, dh=8):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (g, lq, dh)),
            jax.random.normal(kk, (g, lk, dh)),
            jax.random.normal(kv, (g, lk, dh)))


def test_kernel_matches_reference_interpret():
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv(jax.random.PRNGKey(0))
    with pltpu.force_tpu_interpret_mode():
        got = fused_attention(q, k, v, 0.35, 4)
    want = attention_reference(q, k, v, 0.35)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_auto_reference_path_and_rank4():
    q, k, v = _qkv(jax.random.PRNGKey(1), g=12)
    got3 = fused_attention_auto(q, k, v, 0.5)        # CPU -> reference path
    want = attention_reference(q, k, v, 0.5)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want), rtol=1e-5)

    q4 = q.reshape(3, 4, *q.shape[1:])
    k4 = k.reshape(3, 4, *k.shape[1:])
    v4 = v.reshape(3, 4, *v.shape[1:])
    got4 = fused_attention_auto(q4, k4, v4, 0.5)
    np.testing.assert_allclose(np.asarray(got4).reshape(12, 9, 8),
                               np.asarray(want), rtol=1e-5)


def _qkv_heads(key, b=10, n=13, h=5, hd=4):
    kq, kk, kv = jax.random.split(key, 3)
    shape = (b, n, h, hd)
    return (jax.random.normal(kq, shape), jax.random.normal(kk, shape),
            jax.random.normal(kv, shape))


def test_heads_kernel_matches_reference_interpret():
    """Masked-full-dot VMEM kernel == head-last einsum formula, incl. the
    batch-padding path (b=10 not a multiple of block_g=4) and the folded
    MViT +q residual on non-CLS tokens."""
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv_heads(jax.random.PRNGKey(3))
    for residual in (False, True):
        with pltpu.force_tpu_interpret_mode():
            got = fused_attention_heads(q, k, v, 0.5, 4, residual)
        want = attention_reference_heads(q, k, v, 0.5, residual)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"residual={residual}")


def test_heads_kernel_vitbackbone_shapes_interpret():
    """The tiny-dim_head ViTBackbone routing (nn/transformer.py) reaches
    the heads kernel at 4 heads of 16 over 65 and 146 tokens — pin those
    shapes too (small batch, interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    for n in (65, 146):
        q, k, v = _qkv_heads(jax.random.PRNGKey(n), b=5, n=n, h=4, hd=16)
        with pltpu.force_tpu_interpret_mode():
            got = fused_attention_heads(q, k, v, 0.25, 4)
        want = attention_reference_heads(q, k, v, 0.25)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5, err_msg=f"n={n}")


def test_auto_heads_block_g_doomed_seq_falls_back():
    """When even block_g=8 exceeds the scoped-VMEM budget (n >= ~196),
    _auto_heads_block_g must signal fallback (None) instead of handing
    Mosaic a doomed compile, and fused_attention_heads must refuse the
    auto path with a clear error (ADVICE r4)."""
    import pytest

    from vit_cnn_tpu.ops.attention import _auto_heads_block_g

    assert _auto_heads_block_g(65) == 32
    assert _auto_heads_block_g(146) == 8
    assert _auto_heads_block_g(196) is None
    assert _auto_heads_block_g(512) is None

    q, k, v = _qkv_heads(jax.random.PRNGKey(9), b=2, n=196, h=4, hd=16)
    with pytest.raises(ValueError, match="no VMEM-safe block"):
        fused_attention_heads(q, k, v, 0.25)
    # the routing wrapper silently takes the reference formula instead
    got = fused_attention_heads_auto(q, k, v, 0.25)
    want = attention_reference_heads(q, k, v, 0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_ln_groups_matmul_matches_reference():
    """Reshape-free matmul-stat group LN == ln_groups_reference. bf16
    inputs: the group MEAN is exact by construction (bf16 x 1/hd products
    with f32 accumulation); the centered variance rounds d*d once through
    bf16 — assert well inside bf16 forward noise. f32 inputs compared at
    matmul-decomposition tolerance."""
    from vit_cnn_tpu.ops.attention import (ln_groups_matmul,
                                           ln_groups_reference)

    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (6, 13, 64)) * 2.0 + 1.5
    gamma = jax.random.normal(jax.random.PRNGKey(1), (4,))
    beta = jax.random.normal(jax.random.PRNGKey(2), (4,))

    want = ln_groups_reference(x.astype(jnp.bfloat16), gamma, beta, 4)
    got = ln_groups_matmul(x.astype(jnp.bfloat16), gamma, beta, 4)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.04, atol=0.04)

    want32 = ln_groups_reference(x, gamma, beta, 4)
    got32 = ln_groups_matmul(x, gamma, beta, 4)
    np.testing.assert_allclose(np.asarray(got32), np.asarray(want32),
                               rtol=2e-2, atol=2e-2)


def test_heads_auto_reference_path_and_gradients():
    q, k, v = _qkv_heads(jax.random.PRNGKey(4))
    got = fused_attention_heads_auto(q, k, v, 0.5)   # CPU -> reference path
    want = attention_reference_heads(q, k, v, 0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    def loss(q, k, v):
        return jnp.sum(fused_attention_heads_auto(q, k, v, 0.5) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


def test_pooled_kernel_matches_reference_interpret():
    """Fused LN+attention+residual kernel == the unfused composition
    (grouped flax-style LN then head-last attention with +q residual)."""
    from jax.experimental.pallas import tpu as pltpu

    from vit_cnn_tpu.ops.attention import (pooled_attention_reference,
                                           pooled_heads_attention)

    b, n, h, hd = 6, 9, 5, 4
    c = h * hd
    keys = jax.random.split(jax.random.PRNGKey(5), 9)
    q, k, v = (jax.random.normal(keys[i], (b, n, c)) for i in range(3))
    lns = [(1.0 + 0.1 * jax.random.normal(keys[3 + 2 * i], (hd,)),
            0.1 * jax.random.normal(keys[4 + 2 * i], (hd,)))
           for i in range(3)]
    for residual in (True, False):
        with pltpu.force_tpu_interpret_mode():
            got = pooled_heads_attention(
                q, k, v, lns[0][0], lns[0][1], lns[1][0], lns[1][1],
                lns[2][0], lns[2][1], h, 0.5, 4, residual)
        want = pooled_attention_reference(q, k, v, lns[0], lns[1], lns[2],
                                          h, 0.5, residual)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"residual={residual}")


def test_pooled_auto_middle_path_matches_reference_interpret():
    """The gated-off TPU fallback of pooled_heads_attention_auto (XLA
    hd-group LNs + the hardware-verified heads kernel) == the pure
    reference composition — MHST's default serving path while
    VCT_POOLED_ATTN stays 0 (VERDICT r3 #2/#3)."""
    from jax.experimental.pallas import tpu as pltpu

    from vit_cnn_tpu.ops.attention import (fused_attention_heads,
                                           ln_groups_reference,
                                           pooled_attention_reference)

    b, n, h, hd = 6, 9, 5, 4
    c = h * hd
    keys = jax.random.split(jax.random.PRNGKey(7), 9)
    q, k, v = (jax.random.normal(keys[i], (b, n, c)) for i in range(3))
    lns = [(1.0 + 0.1 * jax.random.normal(keys[3 + 2 * i], (hd,)),
            0.1 * jax.random.normal(keys[4 + 2 * i], (hd,)))
           for i in range(3)]
    for residual in (True, False):
        heads = lambda t, ln: ln_groups_reference(t, *ln, hd).reshape(
            b, n, h, hd)
        with pltpu.force_tpu_interpret_mode():
            got = fused_attention_heads(heads(q, lns[0]), heads(k, lns[1]),
                                        heads(v, lns[2]), 0.5, 4,
                                        residual).reshape(b, n, c)
        want = pooled_attention_reference(q, k, v, lns[0], lns[1], lns[2],
                                          h, 0.5, residual)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"residual={residual}")


def test_ln_groups_matches_flax_layernorm():
    """ln_groups_reference == nn.LayerNorm over the (b, n, h, hd) view —
    the exact semantics the MHST pool LN had before the kernel fold."""
    import flax.linen as nn

    from vit_cnn_tpu.ops.attention import ln_groups_reference

    b, n, h, hd = 4, 7, 5, 4
    x = jax.random.normal(jax.random.PRNGKey(6), (b, n, h * hd))
    ln = nn.LayerNorm(epsilon=1e-5)
    variables = ln.init(jax.random.PRNGKey(7), x.reshape(b, n, h, hd))
    scale = 1.0 + 0.3 * jax.random.normal(jax.random.PRNGKey(8), (hd,))
    bias = 0.2 * jax.random.normal(jax.random.PRNGKey(9), (hd,))
    variables = {"params": {"scale": scale, "bias": bias}}
    want = ln.apply(variables, x.reshape(b, n, h, hd)).reshape(b, n, h * hd)
    got = ln_groups_reference(x, scale, bias, hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_gradients_flow():
    q, k, v = _qkv(jax.random.PRNGKey(2))

    def loss(q, k, v):
        return jnp.sum(fused_attention_auto(q, k, v, 0.2) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

def test_vit_attention_routing_branches_agree():
    """ViTAttention's two routings — the tiny-heads branch and the
    G-folded general branch — share one param tree and must produce the
    same output, so flipping VCT_HEADS_ATTN can never change model
    numerics (only kernel choice). Exercised by monkeypatching the gate
    (off-TPU it always routes tiny-heads)."""
    from vit_cnn_tpu.nn import transformer as tr

    mod = tr.ViTAttention(dim=64, heads=4, dim_head=16)
    x = jax.random.normal(jax.random.PRNGKey(9), (3, 65, 64))
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x)

    orig = tr._heads_routing_enabled
    try:
        tr._heads_routing_enabled = lambda: True
        on = mod.apply(variables, x)
        tr._heads_routing_enabled = lambda: False
        off = mod.apply(variables, x)
    finally:
        tr._heads_routing_enabled = orig
    np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                               rtol=2e-5, atol=2e-6)
