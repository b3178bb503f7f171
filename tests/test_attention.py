"""Fused attention kernel (ops/attention.py): reference equivalence via the
Pallas TPU interpreter, gradients, rank-4 folding."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_cnn_tpu.ops.attention import (attention_reference, fused_attention,
                                       fused_attention_auto)


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


def test_gradients_flow():
    q, k, v = _qkv(jax.random.PRNGKey(2))

    def loss(q, k, v):
        return jnp.sum(fused_attention_auto(q, k, v, 0.2) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0
