"""Optimizers and LR schedules.

Mirrors the reference's optimizer zoo (ref: model_utils.py:47-511):
torch Adam (L2 via grad-add), torch AdamW (decoupled wd 0.01 default),
SGD momentum, and the default StepLR(step_size=30, gamma=0.9) applied
per-epoch (ref: model_utils.py:493-503).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import optax


@dataclasses.dataclass(frozen=True)
class OptimizerSpec:
    name: str = "adam"          # adam | adamw | sgd
    lr: float = 1e-3
    weight_decay: float = 0.0   # adam: L2-into-grad; adamw: decoupled
    momentum: float = 0.0       # sgd only
    # scheduler: StepLR(step_size epochs, gamma); None disables
    step_size: Optional[int] = 30
    gamma: float = 0.9


def build_lr_schedule(spec: OptimizerSpec, steps_per_epoch: int):
    """lr(step) = lr * gamma^(epoch // step_size), epoch = step//steps_per_epoch
    — exact StepLR semantics stepped once per epoch
    (ref: model_utils.py:997-1000)."""
    if spec.step_size is None:
        return spec.lr

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return spec.lr * (spec.gamma ** (epoch // spec.step_size))

    return schedule


def build_optimizer(spec: OptimizerSpec, steps_per_epoch: int):
    lr = build_lr_schedule(spec, steps_per_epoch)
    if spec.name == "adam":
        chain = []
        if spec.weight_decay:
            # torch Adam weight_decay adds wd*param to the raw gradient
            chain.append(optax.add_decayed_weights(spec.weight_decay))
        chain += [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                  optax.scale_by_learning_rate(lr)]
        return optax.chain(*chain)
    elif spec.name == "adamw":
        wd = spec.weight_decay if spec.weight_decay else 0.01  # torch default
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    elif spec.name == "sgd":
        chain = []
        if spec.weight_decay:
            chain.append(optax.add_decayed_weights(spec.weight_decay))
        if spec.momentum:
            chain.append(optax.trace(decay=spec.momentum))
        chain.append(optax.scale_by_learning_rate(lr))
        return optax.chain(*chain)
    raise ValueError("unknown optimizer {}".format(spec.name))
