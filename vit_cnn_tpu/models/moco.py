"""MoCo-style multimodal contrastive pretraining model.

The reference's pretrain entry drives a ``moco_based_NNCNet`` whose source
is missing upstream (SURVEY.md §2.2; registry entry
ref: model_utils.py:473-487 — patch 9, Adam 5e-4, 200 epochs, batch 64,
unweighted CE on the (logits, target) pair). What is knowable from the
harness is the contract:

    net(x1_v1, x1_v2, x2_v1, x2_v2) -> (logits, target, k)

with CE(logits, target) as the loss (ref: model_utils.py:748-750) — i.e.
InfoNCE with a momentum key encoder and a negative queue (MoCo). This
module is a TPU-native reconstruction of that contract around a pluggable
dual-modality encoder; the momentum parameters and the queue live in a
``MoCoState`` pytree threaded through the jitted step (no in-place buffers).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct


class DualModalEncoder(nn.Module):
    """Default base encoder: two small conv trunks + fused MLP projection.

    Stands in for the missing NNCNet base encoder (``proposed``); any
    module with signature ``(hsi, lidar, train) -> (B, D) embedding`` works.
    """

    embed_dim: int = 128

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        def trunk(x, width):
            for w in (width, 2 * width):
                x = nn.Conv(w, (3, 3), padding="SAME", use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=not train)(x)
                x = nn.relu(x)
            return jnp.mean(x, axis=(1, 2))

        h = jnp.concatenate([trunk(x1, 64), trunk(x2, 16)], axis=-1)
        h = nn.Dense(self.embed_dim)(h)
        h = nn.relu(h)
        return nn.Dense(self.embed_dim)(h)


class MoCoState(struct.PyTreeNode):
    key_variables: Any            # momentum copy of the encoder variables
    queue: jnp.ndarray            # (K, D) L2-normalized negatives
    queue_ptr: jnp.ndarray        # scalar int32


def init_moco_state(variables, queue_size: int, embed_dim: int) -> MoCoState:
    queue = jax.random.normal(jax.random.PRNGKey(0), (queue_size, embed_dim))
    queue = queue / jnp.linalg.norm(queue, axis=1, keepdims=True)
    return MoCoState(key_variables=jax.tree_util.tree_map(jnp.array, variables),
                     queue=queue,
                     queue_ptr=jnp.zeros((), jnp.int32))


def moco_forward(encoder: nn.Module, variables, moco: MoCoState,
                 x1_v1, x1_v2, x2_v1, x2_v2, momentum: float = 0.999,
                 temperature: float = 0.07
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, MoCoState]:
    """One MoCo forward: returns (logits, target, k, new_moco_state).

    Query = view 1 of both modalities through the online encoder;
    Key = view 2 through the momentum encoder (stop-gradient).
    Queue update is pure: a dynamic-update-slice on the state pytree.
    """
    q, _ = encoder.apply(variables, x1_v1, x2_v1, train=True,
                         mutable=["batch_stats"])
    q = q / (jnp.linalg.norm(q, axis=1, keepdims=True) + 1e-12)

    new_key_vars = jax.tree_util.tree_map(
        lambda a, b: momentum * a + (1.0 - momentum) * b,
        moco.key_variables, variables)
    k, _ = encoder.apply(jax.lax.stop_gradient(new_key_vars), x1_v2, x2_v2,
                         train=True, mutable=["batch_stats"])
    k = jax.lax.stop_gradient(
        k / (jnp.linalg.norm(k, axis=1, keepdims=True) + 1e-12))

    l_pos = jnp.sum(q * k, axis=1, keepdims=True)          # (B, 1)
    l_neg = q @ moco.queue.T                               # (B, K)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    target = jnp.zeros(q.shape[0], dtype=jnp.int32)

    # dequeue-and-enqueue (batch must divide the queue size, as in MoCo)
    ptr = moco.queue_ptr
    queue = jax.lax.dynamic_update_slice(moco.queue, k, (ptr, 0))
    ptr = (ptr + k.shape[0]) % moco.queue.shape[0]
    new_state = MoCoState(key_variables=new_key_vars, queue=queue,
                          queue_ptr=ptr)
    return logits, target, k, new_state
