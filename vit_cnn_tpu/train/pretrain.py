"""Contrastive pretraining loop — TPU-native ref: model_utils.py:682-851.

One jitted step fuses: two-view gather + augmentation, online/momentum
encoder forwards, InfoNCE loss, gradient update, momentum update, queue
update. The Python level only shuffles centers and applies the epoch-level
learning-rate policy (``adjust_learning_rate`` parity, ref: utils.py:21-30:
cosine over total epochs, or stepwise 0.1x at milestones — evaluated at
``e-1`` as the reference does, ref: model_utils.py:736).

Checkpoint policy parity (ref: model_utils.py:822-851): best tracked by
<=-tie on epoch-mean loss under ``pre_train/best_epoch``; fixed snapshots
at epochs 128/200/300 under ``pre_train/final_epoch``.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.moco import (MoCoState, init_moco_state, moco_forward)
from ..pipeline.twoview import TwoViewPipeline
from . import checkpoint as ckpt
from .loop import _pad_to_multiple


def adjust_learning_rate(base_lr: float, epoch: int, hp: Dict) -> float:
    """ref: utils.py:21-30 — returns the lr for this (0-based) epoch."""
    lr = base_lr
    if hp.get("cos"):
        lr *= 0.5 * (1.0 + math.cos(math.pi * epoch / hp["epoch"]))
    else:
        for milestone in hp.get("schedule_milestones", []):
            lr *= 0.1 if epoch >= milestone else 1.0
    return lr


class Pretrainer:
    """MoCo pretraining over a :class:`TwoViewPipeline`."""

    def __init__(self, encoder, hyperparams: Dict, pipeline: TwoViewPipeline,
                 queue_size: int = 2048, momentum: float = 0.999,
                 temperature: float = 0.07, embed_dim: int = 128,
                 seed: int = 0, checkpoint_root: str = "./checkpoints",
                 savename: str = "", mesh=None,
                 save_checkpoints: bool = True):
        self.encoder = encoder
        self.hp = hyperparams
        self.pipeline = pipeline
        self.momentum = momentum
        self.temperature = temperature
        self.checkpoint_root = checkpoint_root
        self.savename = savename
        self.save_checkpoints = save_checkpoints
        self.mesh = mesh

        self.batch_size = int(hyperparams["batch_size"])
        self.epochs = int(hyperparams["epoch"])
        self.base_lr = float(hyperparams["lr"])
        if queue_size % self.batch_size:
            queue_size = ((queue_size + self.batch_size - 1)
                          // self.batch_size) * self.batch_size
        self.losses = []

        key = jax.random.PRNGKey(seed)
        init_key, self.data_key = jax.random.split(key)
        p = pipeline.patch_size
        d1 = jnp.zeros((2, p, p, pipeline.scene1.shape[-1]), jnp.float32)
        d2 = jnp.zeros((2, p, p, pipeline.scene2.shape[-1]), jnp.float32)
        # jitted init: flax's plain init executes eagerly op-by-op (slow on
        # CPU); one compiled program + persistent-cache hit instead
        self.variables = jax.jit(encoder.init, static_argnames=("train",))(
            {"params": init_key}, d1, d2, train=False)
        self.moco = init_moco_state(self.variables, queue_size, embed_dim)

        # lr is injected per epoch (adjust_learning_rate parity), so the
        # optimizer takes it as a runtime hyperparameter
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=self.base_lr)
        self.opt_state = self.tx.init(self.variables["params"])
        self.np_rng = np.random.RandomState(seed)
        self._step = self._build_step()

    def _build_step(self):
        encoder = self.encoder
        pipeline = self.pipeline
        tx = self.tx
        momentum = self.momentum
        temperature = self.temperature

        def step(variables, opt_state, moco: MoCoState, centers, valid, rng,
                 lr, arrays):
            v1_1, v1_2, v2_1, v2_2, _ = pipeline.make_views(rng, centers,
                                                            arrays=arrays)

            def loss_fn(params):
                var = {**variables, "params": params}
                logits, target, k, new_moco = moco_forward(
                    encoder, var, moco, v1_1, v1_2, v2_1, v2_2,
                    momentum=momentum, temperature=temperature)
                losses = optax.softmax_cross_entropy_with_integer_labels(
                    logits, target)
                loss = jnp.sum(losses * valid) / jnp.maximum(
                    jnp.sum(valid), 1.0)
                return loss, new_moco

            (loss, new_moco), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(variables["params"])
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = tx.update(grads, opt_state,
                                           variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            return {**variables, "params": params}, opt_state, new_moco, loss

        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            bs = batch_sharding(self.mesh)
            rep = replicated(self.mesh)
            return jax.jit(step,
                           in_shardings=(rep, rep, rep, bs, bs, rep, rep,
                                         rep),
                           out_shardings=(rep, rep, rep, rep))
        return jax.jit(step)

    def fit(self, run: int = 0, dataset_name: str = "dataset",
            log_every: int = 0):
        """Returns the best-loss variables (ref best_model_wts semantics)."""
        best_loss = 100.0
        best_variables = jax.device_get(self.variables)
        bs = self.batch_size
        for e in range(1, self.epochs + 1):
            lr = adjust_learning_rate(self.base_lr, e - 1, self.hp)
            order = self.pipeline.epoch_order(self.np_rng)
            centers_all, valid_all = _pad_to_multiple(order, bs)
            epoch_loss, n_steps = 0.0, 0
            for i in range(0, len(centers_all), bs):
                self.data_key, sub = jax.random.split(self.data_key)
                centers = jnp.asarray(centers_all[i:i + bs])
                valid = jnp.asarray(valid_all[i:i + bs])
                (self.variables, self.opt_state, self.moco,
                 loss) = self._step(self.variables, self.opt_state,
                                    self.moco, centers, valid, sub,
                                    jnp.float32(lr),
                                    self.pipeline.device_arrays())
                epoch_loss += float(loss)
                n_steps += 1
            avg = epoch_loss / max(n_steps, 1)
            self.losses.append(avg)
            if log_every and e % log_every == 0:
                print("pretrain epoch {}/{} loss {:.4f} lr {:.2e}".format(
                    e, self.epochs, avg, lr))

            if abs(avg) <= best_loss:           # <= tie rule, ref :826
                best_loss = abs(avg)
                best_variables = jax.device_get(self.variables)
                if self.save_checkpoints:
                    ckpt.save_checkpoint(
                        best_variables, self.checkpoint_root,
                        self.encoder.__class__.__name__.lower(),
                        dataset_name, "pre_train", "best_epoch",
                        self.savename, run, e, best_loss)
            if e in (128, 200, 300) and self.save_checkpoints:
                ckpt.save_checkpoint(
                    jax.device_get(self.variables), self.checkpoint_root,
                    self.encoder.__class__.__name__.lower(), dataset_name,
                    "pre_train", "final_epoch", self.savename, run, e,
                    abs(avg))
        return best_variables
