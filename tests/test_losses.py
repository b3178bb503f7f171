"""Loss parity tests vs. torch formulas (ref: losses.py, model_utils.py:60-66)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vit_cnn_tpu.train import (cross_fusion_loss, endnet_loss,
                               weighted_cross_entropy)


def _np_weighted_ce(logits, targets, weights):
    """torch.nn.CrossEntropyLoss(weight=w) reference formula."""
    logits = np.asarray(logits, np.float64)
    z = logits - logits.max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    nll = -logp[np.arange(len(targets)), targets]
    w = weights[targets]
    return (w * nll).sum() / w.sum()


def test_weighted_ce_matches_torch_formula(rng):
    logits = rng.randn(32, 6).astype(np.float32)
    targets = rng.randint(0, 6, 32)
    weights = np.array([0.0, 1, 2, 1, 0.5, 1], np.float32)
    got = float(weighted_cross_entropy(jnp.asarray(logits),
                                       jnp.asarray(targets),
                                       jnp.asarray(weights)))
    assert got == pytest.approx(_np_weighted_ce(logits, targets, weights),
                                rel=1e-5)


def test_weighted_ce_ignores_zero_weight_classes(rng):
    logits = rng.randn(8, 3).astype(np.float32)
    targets = np.zeros(8, dtype=np.int64)
    weights = np.array([0.0, 1.0, 1.0], np.float32)
    got = float(weighted_cross_entropy(jnp.asarray(logits),
                                       jnp.asarray(targets),
                                       jnp.asarray(weights)))
    assert got == 0.0  # all targets are the ignored class


def test_valid_mask_equals_dropping_samples(rng):
    logits = rng.randn(10, 4).astype(np.float32)
    targets = rng.randint(0, 4, 10)
    weights = np.ones(4, np.float32)
    valid = np.array([1] * 7 + [0] * 3, np.float32)
    masked = float(weighted_cross_entropy(jnp.asarray(logits),
                                          jnp.asarray(targets),
                                          jnp.asarray(weights),
                                          jnp.asarray(valid)))
    dropped = float(weighted_cross_entropy(jnp.asarray(logits[:7]),
                                           jnp.asarray(targets[:7]),
                                           jnp.asarray(weights)))
    assert masked == pytest.approx(dropped, rel=1e-6)


def test_cross_fusion_loss_components(rng):
    o1 = rng.randn(6, 5).astype(np.float32)
    o2 = rng.randn(6, 5).astype(np.float32)
    o3 = rng.randn(6, 5).astype(np.float32)
    t = rng.randint(0, 5, 6)
    w = np.ones(5, np.float32)
    got = float(cross_fusion_loss((jnp.asarray(o1), jnp.asarray(o2),
                                   jnp.asarray(o3)), jnp.asarray(t),
                                  jnp.asarray(w)))
    expect = (_np_weighted_ce(o1, t, w) + np.mean((o1 - o2) ** 2)
              + np.mean((o1 - o3) ** 2))
    assert got == pytest.approx(expect, rel=1e-5)


def test_endnet_loss_components(rng):
    out = rng.randn(6, 5).astype(np.float32)
    de1, x1 = rng.randn(6, 20).astype(np.float32), rng.randn(6, 20).astype(np.float32)
    de2, x2 = rng.randn(6, 1).astype(np.float32), rng.randn(6, 1).astype(np.float32)
    t = rng.randint(0, 5, 6)
    w = np.ones(5, np.float32)
    got = float(endnet_loss(tuple(map(jnp.asarray, (out, de1, de2, x1, x2))),
                            jnp.asarray(t), jnp.asarray(w)))
    expect = (_np_weighted_ce(out, t, w) + np.mean((de1 - x1) ** 2)
              + np.mean((de2 - x2) ** 2))
    assert got == pytest.approx(expect, rel=1e-5)
