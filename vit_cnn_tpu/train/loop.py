"""Jitted training loop with per-epoch validation and best-val tracking.

TPU-native re-design of ref: model_utils.py:854-1045 (train) and
:1135-1158 (val): the whole hot path — patch gather, augmentation, forward,
backward, optimizer update — is ONE jitted program per batch; the Python
level only shuffles indices and tracks the best parameters.
"""

from __future__ import annotations

import copy
import dataclasses
import time
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.precision import cast_floating
from ..pipeline.patches import PatchPipeline
from .losses import LOSSES
from .optim import OptimizerSpec, build_optimizer
from .state import TrainState
from . import checkpoint as ckpt


@dataclasses.dataclass
class TrainLog:
    losses: List[float] = dataclasses.field(default_factory=list)
    val_accuracies: List[float] = dataclasses.field(default_factory=list)
    epoch_seconds: List[float] = dataclasses.field(default_factory=list)


def _pad_to_multiple(arr: np.ndarray, multiple: int):
    n = len(arr)
    rem = (-n) % multiple
    if rem == 0:
        return arr, np.ones(n, dtype=np.float32)
    pad = np.repeat(arr[:1], rem, axis=0)
    valid = np.concatenate([np.ones(n, dtype=np.float32),
                            np.zeros(rem, dtype=np.float32)])
    return np.concatenate([arr, pad], axis=0), valid


class Trainer:
    """Builds the jitted train/eval steps for one (model, pipeline) pair."""

    def __init__(self, module, hyperparams: Dict, pipeline: PatchPipeline,
                 val_pipeline: Optional[PatchPipeline] = None,
                 seed: int = 0, checkpoint_root: str = "./checkpoints",
                 savename: str = "", mesh=None,
                 save_checkpoints: bool = True):
        self.module = module
        self.hp = hyperparams
        self.pipeline = pipeline
        self.val_pipeline = val_pipeline
        self.checkpoint_root = checkpoint_root
        self.savename = savename
        self.mesh = mesh
        self.save_checkpoints = save_checkpoints
        self.log = TrainLog()

        self.batch_size = int(hyperparams["batch_size"])
        self.epochs = int(hyperparams["epoch"])
        self.loss_fn = LOSSES[hyperparams.get("loss", "cross_entropy")]
        self.class_weights = jnp.asarray(hyperparams["weights"],
                                         dtype=jnp.float32)

        steps_per_epoch = max(len(pipeline) // self.batch_size, 1)
        opt_spec = OptimizerSpec(
            name=hyperparams.get("optimizer", "adam"),
            lr=float(hyperparams["lr"]),
            weight_decay=float(hyperparams.get("weight_decay", 0.0)),
            step_size=hyperparams.get("scheduler_step", 30),
            gamma=hyperparams.get("scheduler_gamma", 0.9),
        )
        self.tx = build_optimizer(opt_spec, steps_per_epoch)

        # --- init params -------------------------------------------------
        self.root_key = jax.random.PRNGKey(seed)
        init_key, self.data_key = jax.random.split(self.root_key)
        p = pipeline.patch_size
        c1 = pipeline.scene1.shape[-1]
        c2 = pipeline.scene2.shape[-1]
        dummy1 = jnp.zeros((2, p, p, c1), jnp.float32)
        dummy2 = jnp.zeros((2, p, p, c2), jnp.float32)
        # jit the init: flax's plain init executes EAGERLY op-by-op — ~40s
        # of per-op dispatch for the flagship on CPU; as one compiled
        # program it traces in <1s and the compile hits the persistent cache
        variables = jax.jit(module.init, static_argnames=("train",))(
            {"params": init_key, "dropout": init_key},
            dummy1, dummy2, train=False)
        self.state = TrainState.create_from_variables(
            module.apply, variables, self.tx)
        self.np_rng = np.random.RandomState(seed)

        # bf16 training: store the TRAIN gather sources in bf16. The
        # GATHER itself is bit-identical (cast commutes with gather) and
        # half-width rows halve the dominant gather traffic
        # (perf/profile_train.py); downstream augmentation now runs in
        # bf16 rather than f32-then-cast — an accepted train-path
        # precision change. The val pipeline must stay f32 (evaluation
        # runs the f32 path), so it must be a distinct object.
        if hyperparams.get("bf16"):
            assert pipeline is not val_pipeline, (
                "bf16 training casts the train pipeline's scenes in place;"
                " pass a separate val_pipeline so eval gathers stay f32")
            pipeline.to_compute_dtype(jnp.bfloat16)

        # large rasters ride as runtime args through every jit boundary
        # (closure constants get embedded into shipped executables on some
        # backends; see PatchPipeline.device_arrays)
        self._arrays = pipeline.device_arrays()
        self._val_arrays = (val_pipeline.device_arrays()
                            if val_pipeline is not None else None)
        self._step = self._build_step()
        self._eval_step = self._build_eval_step()
        if val_pipeline is not None:
            self._val_batch = jax.jit(
                partial(val_pipeline.make_batch, train=False))
        else:
            self._val_batch = None

    # ------------------------------------------------------------------
    def _build_step(self):
        module = self.module
        pipeline = self.pipeline
        loss_fn = self.loss_fn
        class_weights = self.class_weights
        bf16 = bool(self.hp.get("bf16", False))

        def step(state: TrainState, centers, valid, rng, arrays,
                 loss_sum):
            data_key, dropout_key = jax.random.split(rng)
            p1, p2, labels = pipeline.make_batch(data_key, centers,
                                                 train=True, arrays=arrays)

            def compute_loss(params):
                # bf16 policy: compute in bf16, keep f32 master params /
                # batch stats / loss (grads come out f32 via the cast's vjp)
                variables = {"params": cast_floating(params, jnp.bfloat16)
                             if bf16 else params}
                mutable = []
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    mutable = ["batch_stats"]
                x1, x2 = ((p1.astype(jnp.bfloat16), p2.astype(jnp.bfloat16))
                          if bf16 else (p1, p2))
                out = module.apply(variables, x1, x2, train=True,
                                   mutable=mutable,
                                   rngs={"dropout": dropout_key})
                if mutable:
                    out, updates = out
                    if bf16:
                        updates = {"batch_stats": cast_floating(
                            updates["batch_stats"], jnp.float32)}
                else:
                    updates = {}
                if bf16:
                    out = cast_floating(out, jnp.float32)
                loss = loss_fn(out, labels, class_weights, valid)
                return loss, updates

            (loss, updates), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            if updates:
                state = state.replace(batch_stats=updates["batch_stats"])
            # the epoch loss accumulates INSIDE the jitted step: no per-step
            # host sync (async dispatch stays pipelined), and no EAGER op on
            # mesh-replicated arrays either — eager dispatch over a
            # multi-device CPU mesh intermittently SIGABRTs in XLA:CPU
            # (observed in test_cli_mesh_end_to_end, 2026-08-17)
            return state, loss_sum + loss

        if self.mesh is not None:
            # DP over the mesh: batch (centers/valid) sharded on 'data',
            # state + rng replicated; XLA inserts the gradient psum.
            from ..parallel.mesh import batch_sharding, replicated

            bs = batch_sharding(self.mesh)
            rep = replicated(self.mesh)
            return jax.jit(step,
                           in_shardings=(rep, bs, bs, rep, rep, rep),
                           out_shardings=(rep, rep))
        return jax.jit(step)

    def _build_eval_step(self):
        module = self.module
        ignored_mask = self.pipeline.ignored_mask

        @jax.jit
        def eval_step(variables, p1, p2, labels, valid):
            out = module.apply(variables, p1, p2, train=False)
            logits = out[0] if isinstance(out, tuple) else out
            pred = jnp.argmax(logits, axis=-1)
            # val() parity: predictions in ignored labels are skipped
            # (ref: model_utils.py:1152-1157)
            keep = (~ignored_mask[pred]) & (valid > 0)
            correct = jnp.sum((pred == labels) & keep)
            total = jnp.sum(keep)
            return correct, total

        return eval_step

    # ------------------------------------------------------------------
    def validate(self, state: Optional[TrainState] = None) -> float:
        state = state or self.state
        vp = self.val_pipeline
        if vp is None or len(vp) == 0:
            return 0.0
        variables = state.variables
        correct, total = 0, 0
        bs = self.batch_size
        centers_all, valid_all = _pad_to_multiple(vp.indices, bs)
        key = jax.random.PRNGKey(0)
        for i in range(0, len(centers_all), bs):
            centers = jnp.asarray(centers_all[i:i + bs])
            valid = jnp.asarray(valid_all[i:i + bs])
            p1, p2, labels = self._val_batch(key, centers,
                                             arrays=self._val_arrays)
            c, t = self._eval_step(variables, p1, p2, labels, valid)
            correct += int(c)
            total += int(t)
        return correct / max(total, 1)

    # ------------------------------------------------------------------
    # Resumable checkpointing (SURVEY.md §5 elastic recovery): full train
    # state + host RNGs, so a restarted run continues with the identical
    # shuffle order and augmentation stream.
    def save_resumable(self, path: str, epoch: int) -> str:
        rng_state = self.np_rng.get_state()
        extra = {"epoch": epoch,
                 "np_rng": [rng_state[0], np.asarray(rng_state[1]).tolist(),
                            int(rng_state[2]), int(rng_state[3]),
                            float(rng_state[4])],
                 "data_key": np.asarray(
                     jax.random.key_data(self.data_key)).tolist()}
        return ckpt.save_train_state(path, self.state, extra)

    def restore_resumable(self, path: str) -> int:
        """Returns the epoch to resume FROM (0 if no metadata)."""
        self.state, extra = ckpt.restore_train_state(path, self.state)
        if not extra:
            return 0
        s = extra["np_rng"]
        self.np_rng.set_state((s[0], np.asarray(s[1], dtype=np.uint32),
                               int(s[2]), int(s[3]), float(s[4])))
        self.data_key = jax.random.wrap_key_data(
            jnp.asarray(extra["data_key"], dtype=jnp.uint32))
        return int(extra["epoch"])

    # ------------------------------------------------------------------
    def fit(self, run: int = 0, dataset_name: str = "dataset",
            log_every: int = 0, on_epoch_end: Optional[Callable] = None,
            start_epoch: int = 0):
        """Train; returns the best-validation variables (deepcopy), mirroring
        ref: model_utils.py:1015-1045. ``start_epoch`` > 0 continues a run
        restored with :meth:`restore_resumable`."""
        best_metric = 0.0
        best_variables = jax.device_get(self.state.variables)
        bs = self.batch_size

        for epoch in range(start_epoch + 1, self.epochs + 1):
            t0 = time.time()
            order = self.pipeline.epoch_order(self.np_rng)
            centers_all, valid_all = _pad_to_multiple(order, bs)
            # the loss sum rides inside the jitted step (no per-step host
            # sync — step N+1's launch would serialize behind step N's
            # completion on TPU — and no eager ops on mesh arrays, which
            # can SIGABRT XLA:CPU); one float() per epoch
            loss_sum = jnp.float32(0.0)
            n_steps = 0
            for i in range(0, len(centers_all), bs):
                self.data_key, sub = jax.random.split(self.data_key)
                centers = jnp.asarray(centers_all[i:i + bs])
                valid = jnp.asarray(valid_all[i:i + bs])
                self.state, loss_sum = self._step(self.state, centers,
                                                  valid, sub, self._arrays,
                                                  loss_sum)
                n_steps += 1
            avg_loss = float(loss_sum) / n_steps if n_steps else 0.0
            self.log.losses.append(avg_loss)

            if self.val_pipeline is not None:
                val_acc = self.validate()
                self.log.val_accuracies.append(val_acc)
                metric = val_acc
            else:
                metric = -avg_loss

            self.log.epoch_seconds.append(time.time() - t0)
            if log_every and epoch % log_every == 0:
                secs = self.log.epoch_seconds[-1]
                print("epoch {}/{} loss {:.4f} val {:.4f} "
                      "({:.2f}s, {:.0f} patches/s)".format(
                          epoch, self.epochs, avg_loss,
                          self.log.val_accuracies[-1]
                          if self.log.val_accuracies else float("nan"),
                          secs, len(self.pipeline) / max(secs, 1e-9)))

            # best tracking uses >= so later epochs win ties
            # (ref: model_utils.py:1015-1017)
            if abs(metric) >= best_metric:
                best_metric = abs(metric)
                best_variables = jax.device_get(self.state.variables)
                if self.save_checkpoints:
                    ckpt.save_checkpoint(
                        best_variables, self.checkpoint_root,
                        self.module.__class__.__name__.lower(), dataset_name,
                        "train", "best_epoch", self.savename, run, epoch,
                        best_metric)
            if epoch == self.epochs and self.save_checkpoints:
                ckpt.save_checkpoint(
                    jax.device_get(self.state.variables),
                    self.checkpoint_root,
                    self.module.__class__.__name__.lower(), dataset_name,
                    "train", "final_epoch", self.savename, run, epoch,
                    abs(metric))
            if on_epoch_end is not None:
                on_epoch_end(epoch, avg_loss, metric)

        return best_variables
