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


# ---------------------------------------------------------------------------
# Full-train-state checkpointing (resume): params + batch_stats + opt_state
# + step + host RNG — orbax-backed. The reference can only restore weights
# (ref: main.py:472-473); resumable training is the SURVEY.md §5 plan for
# "failure detection / elastic recovery".
# ---------------------------------------------------------------------------

def save_train_state(path: str, state, extra: Optional[dict] = None) -> str:
    """Checkpoint a full TrainState (+ JSON-serializable ``extra`` metadata
    like epoch / np_rng state) with orbax; flax-bytes fallback."""
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "opt_state": state.opt_state,
               "step": jax.device_get(state.step)}
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, jax.device_get(payload), force=True)
    except Exception:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".msgpack", "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(payload)))
        path = path + ".msgpack"
    if extra is not None:
        import json

        with open(os.path.join(os.path.dirname(path),
                               os.path.basename(path) + ".meta.json"),
                  "w") as f:
            json.dump(extra, f)
    return path


def restore_train_state(path: str, state):
    """Restore a TrainState saved by :func:`save_train_state`; returns
    (new_state, extra_metadata_or_None)."""
    import json

    path = os.path.abspath(path)
    target = {"params": state.params, "batch_stats": state.batch_stats,
              "opt_state": state.opt_state,
              "step": jax.device_get(state.step)}
    if path.endswith(".msgpack") or os.path.isfile(path):
        with open(path, "rb") as f:
            payload = serialization.from_bytes(target, f.read())
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        payload = ckptr.restore(path, item=target)
    meta_path = os.path.join(os.path.dirname(path),
                             os.path.basename(path) + ".meta.json")
    extra = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            extra = json.load(f)
    new_state = state.replace(params=payload["params"],
                              batch_stats=payload["batch_stats"],
                              opt_state=payload["opt_state"],
                              step=int(payload["step"]))
    return new_state, extra
