"""Loss functions as pure jax functions.

Parity targets:
* weighted cross-entropy with per-class weights and torch-style weighted-mean
  reduction (ref: model_utils.py:60-66 + torch.nn.CrossEntropyLoss),
* Cross_fusion_CNN_Loss = CE + MSE(out1,out2) + MSE(out1,out3)
  (ref: losses.py:7-19),
* EndNet_Loss = CE + MSE(recon1, x1) + MSE(recon2, x2) (ref: losses.py:21-35),
* FocalLoss (ref: losses.py:38-78, unused by the harness but provided).

All losses accept an optional per-sample ``valid`` mask so jitted training can
pad the final partial batch without changing the math.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def weighted_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                           class_weights: Optional[jnp.ndarray] = None,
                           valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss(weight=w) semantics:
    sum_i w[y_i] * nll_i / sum_i w[y_i]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    if class_weights is not None:
        w = class_weights[targets]
    else:
        w = jnp.ones_like(nll)
    if valid is not None:
        w = w * valid
    denom = jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.sum(w * nll) / denom


def _masked_mse(a: jnp.ndarray, b: jnp.ndarray,
                valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    se = (a - b) ** 2
    if valid is None:
        return jnp.mean(se)
    se = se.reshape(se.shape[0], -1)
    w = valid[:, None]
    denom = jnp.maximum(jnp.sum(w) * se.shape[1], 1e-12)
    return jnp.sum(se * w) / denom


def cross_fusion_loss(output: Tuple[jnp.ndarray, ...], targets: jnp.ndarray,
                      class_weights: Optional[jnp.ndarray] = None,
                      valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """CE(out1) + mean((out1-out2)^2) + mean((out1-out3)^2)
    (ref: losses.py:13-19; the sum is deliberately not divided by 3)."""
    out1, out2, out3 = output[0], output[1], output[2]
    loss1 = weighted_cross_entropy(out1, targets, class_weights, valid)
    loss2 = _masked_mse(out1, out2, valid)
    loss3 = _masked_mse(out1, out3, valid)
    return loss1 + loss2 + loss3


def endnet_loss(output: Tuple[jnp.ndarray, ...], targets: jnp.ndarray,
                class_weights: Optional[jnp.ndarray] = None,
                valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """CE(out) + MSE(de_x1, ori_x1) + MSE(de_x2, ori_x2)
    (ref: losses.py:29-35)."""
    out, de_x1, de_x2, ori_x1, ori_x2 = output
    loss1 = weighted_cross_entropy(out, targets, class_weights, valid)
    loss2 = _masked_mse(de_x1, ori_x1, valid)
    loss3 = _masked_mse(de_x2, ori_x2, valid)
    return loss1 + loss2 + loss3


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray, gamma: float = 0.0,
               alpha: Optional[jnp.ndarray] = None,
               size_average: bool = True,
               valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """-(1-p_t)^gamma log p_t (ref: losses.py:38-78)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    pt = jnp.exp(logpt)
    if alpha is not None:
        logpt = logpt * alpha[targets]
    loss = -1.0 * (1 - pt) ** gamma * logpt
    if valid is not None:
        loss = loss * valid
        n = jnp.maximum(jnp.sum(valid), 1e-12)
        return jnp.sum(loss) / n if size_average else jnp.sum(loss)
    return jnp.mean(loss) if size_average else jnp.sum(loss)


def ce_first_output(output, targets, class_weights=None, valid=None):
    """CE on output[0] when a model returns (logits, *aux) but the harness
    trains with plain CE (matches the reference's tuple handling in
    val/test, ref: model_utils.py:1119-1120/1149-1150)."""
    logits = output[0] if isinstance(output, tuple) else output
    return weighted_cross_entropy(logits, targets, class_weights, valid)


def glt_loss(output, targets, class_weights=None, valid=None):
    """CE(blended logits) + in-model reconstruction consistency loss
    (GLT returns (x_cls, con_loss), ref: GLT_Net.py:417-422)."""
    logits, con_loss = output
    return (weighted_cross_entropy(logits, targets, class_weights, valid)
            + con_loss)


LOSSES = {
    "cross_entropy": ce_first_output,
    "cross_fusion": cross_fusion_loss,
    "endnet": endnet_loss,
    "focal": focal_loss,
    "glt": glt_loss,
}
