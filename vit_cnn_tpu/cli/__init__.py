"""CLI — flag-for-flag parity with the reference harness (ref: main.py:69-254)
plus TPU-native extras (mesh size, bf16, artifact dir).

Differences from the reference, all recorded in QUIRKS.md:
* stdout is NOT hijacked to ./results/trytry.txt (ref: main.py:52-53);
  reports go to stdout AND ``<out_dir>/report.txt``.
* Visdom is replaced by the :class:`~vit_cnn_tpu.utils.viz.ArtifactWriter`
  (PNG maps + JSONL scalar stream).
* ``--cuda`` is accepted and ignored — device selection is JAX's.
* ``--strict-seed-parity`` (default on) reproduces the reference's
  constant-``seed[2]`` model seeding quirk (ref: main.py:378).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional

import numpy as np

from ..data.registry import dataset_names, get_dataset
from ..data.io import open_file
from ..data.sampling import compute_imf_weights, sample_gt
from ..metrics.classification import metrics
from ..metrics.report import show_results
from ..models.registry import get_model, model_names
from ..utils.palette import build_palette, convert_to_color
from ..utils.seeding import seed_everything
from ..utils.viz import ArtifactWriter


def build_parser() -> argparse.ArgumentParser:
    """Argparse surface of ref: main.py:69-254 (same flags, same defaults)."""
    parser = argparse.ArgumentParser(
        description="Run deep learning experiments on various hyperspectral "
                    "datasets (TPU-native)")
    parser.add_argument("--dataset", type=str, default="MUUFL",
                        choices=dataset_names(), help="Dataset to use.")
    parser.add_argument("--applyPCA", type=bool, default=None,
                        help="optional, if absent will be set by the model")
    parser.add_argument("--model", type=str, default="Multimodality_Mamba",
                        help="Model to train. Available: " +
                             ", ".join(model_names()))
    parser.add_argument("--folder", type=str, default="./Datasets/",
                        help="Folder where to store the datasets.")
    parser.add_argument("--cuda", type=int, default=0,
                        help="Accepted for reference-CLI compatibility; "
                             "device selection is JAX's (TPU when present).")
    parser.add_argument("--runs", type=int, default=10,
                        help="Number of runs (default: 10)")
    parser.add_argument("--restore", type=str, default=None,
                        help="Checkpoint to use for initialization")
    parser.add_argument("--seed", type=int, default=1, help="Set random seed")

    group_dataset = parser.add_argument_group("Dataset")
    group_dataset.add_argument(
        "--train_val_split", type=float, default=1,
        help="Percentage of samples to use for training and validation; "
             "'1' means all training data are used to train")
    group_dataset.add_argument(
        "--training_sample", type=float, default=20,
        help="Percentage of samples to use for training; if sampling_mode =="
             "'random_fixednumber', the per-class training count")
    group_dataset.add_argument(
        "--sampling_mode", type=str, default="random_fixednumber",
        help="random | fixed | disjoint | random_fixednumber")
    group_dataset.add_argument(
        "--train_set", type=str, default=None,
        help="Path to the train ground truth (supersedes --sampling_mode)")
    group_dataset.add_argument(
        "--test_set", type=str, default=None,
        help="Path to the test set (by default the entire ground truth "
             "minus the training)")

    group_train = parser.add_argument_group("Training")
    group_train.add_argument("--epoch", type=int, default=None,
                             help="Training epochs (model default if absent)")
    group_train.add_argument("--patch_size", type=int, default=None,
                             help="Size of the spatial neighbourhood")
    group_train.add_argument("--lr", type=float, default=None,
                             help="Learning rate (model default if absent)")
    group_train.add_argument("--class_balancing", action="store_true",
                             help="Inverse median frequency class balancing")
    group_train.add_argument("--batch_size", type=int, default=None,
                             help="Batch size (model default if absent)")
    group_train.add_argument("--test_stride", type=int, default=1,
                             help="Sliding window stride during inference")

    group_da = parser.add_argument_group("Data augmentation")
    group_da.add_argument("--flip_augmentation", action="store_true",
                          help="Random flips (if patch_size > 1)")
    group_da.add_argument("--radiation_augmentation", action="store_true",
                          help="Random radiation noise (illumination)")
    group_da.add_argument("--mixture_augmentation", action="store_true",
                          help="Random mixes between spectra")
    parser.add_argument("--with_exploration", action="store_true",
                        help="See data exploration visualization")
    parser.add_argument("--download", type=str, default=None, nargs="+",
                        choices=dataset_names(),
                        help="Download the specified datasets and quit.")

    group_tpu = parser.add_argument_group("TPU-native extras")
    group_tpu.add_argument("--out_dir", type=str, default="./results",
                           help="Artifact directory (replaces Visdom)")
    group_tpu.add_argument("--n_devices", type=int, default=None,
                           help="Mesh size for data-parallel train/infer "
                                "(default: all visible devices)")
    group_tpu.add_argument("--no_mesh", action="store_true",
                           help="Force single-device execution")
    group_tpu.add_argument("--bf16", action="store_true",
                           help="bfloat16 compute policy for the model")
    group_tpu.add_argument("--strict_seed_parity", type=int, default=1,
                           help="1 (default): reproduce the reference's "
                                "constant seed[2] model seeding "
                                "(ref: main.py:378); 0: per-run seeds")
    group_tpu.add_argument("--log_every", type=int, default=10,
                           help="Print loss/val every N epochs (0 = silent)")
    group_tpu.add_argument("--debug_nans", action="store_true",
                           help="Abort on the first NaN anywhere in a jitted "
                                "program (SURVEY.md §5 sanitizer equivalent)")
    group_tpu.add_argument("--profile_dir", type=str, default=None,
                           help="Write a jax.profiler trace of the first "
                                "training epoch to this directory")
    group_tpu.add_argument("--serve", action="store_true",
                           help="persistent serving mode: skip training, "
                                "restore --restore (if given) and answer "
                                "JSON-line full-scene requests on stdin "
                                "(see infer/server.py for the protocol). "
                                "Keeps params, compiled programs and "
                                "uploaded scenes resident across requests "
                                "— the steady-state serving wall instead "
                                "of a cold process per scene")
    group_tpu.add_argument("--infer_chunk", type=int, default=8192,
                           help="Windows per inference device step")

    group_pre = parser.add_argument_group("Contrastive pretraining")
    group_pre.add_argument("--pretrain", action="store_true",
                           help="Run MoCo-style contrastive pretraining over "
                                "all interior pixels instead of supervised "
                                "training (ref: model_utils.py:682-851; "
                                "moco defaults ref: model_utils.py:473-487)")
    group_pre.add_argument("--cos", action="store_true",
                           help="Cosine lr schedule during pretraining "
                                "(ref: utils.py:21-30)")
    group_pre.add_argument("--queue_size", type=int, default=2048,
                           help="MoCo negative queue size")
    group_pre.add_argument("--moco_momentum", type=float, default=0.999)
    group_pre.add_argument("--moco_temperature", type=float, default=0.07)
    return parser


def run_pretrain(args) -> list:
    """MoCo pretraining entry (ref pretrain() was never wired into main;
    here it is a first-class mode)."""
    from ..models.moco import DualModalEncoder
    from ..pipeline.patches import AugmentConfig
    from ..pipeline.twoview import TwoViewPipeline
    from ..train.pretrain import Pretrainer

    (img1, img2, gt, label_values, ignored_labels, rgb_bands,
     palette) = get_dataset(args.dataset, args.folder)
    n_classes = len(label_values)
    # moco_based_NNCNet registry defaults (ref: model_utils.py:473-487)
    hp = {
        "patch_size": args.patch_size or 9,
        "lr": args.lr or 5e-4,
        "epoch": args.epoch or 200,
        "batch_size": args.batch_size or 64,
        "cos": args.cos,
        "dataset": args.dataset,
    }
    aug = AugmentConfig(flip=True, radiation=args.radiation_augmentation,
                        mixture=args.mixture_augmentation)
    pipe = TwoViewPipeline(img1, img2, gt, hp["patch_size"],
                           list(ignored_labels), n_classes, augment=aug)
    enc = DualModalEncoder(embed_dim=128)
    pre = Pretrainer(enc, hp, pipe, queue_size=args.queue_size,
                     momentum=args.moco_momentum,
                     temperature=args.moco_temperature,
                     seed=args.seed, savename=args.model)
    pre.fit(run=0, dataset_name=args.dataset, log_every=args.log_every)
    return pre.losses


def run_serve(args, in_stream=None, out_stream=None) -> int:
    """Persistent serving entry (``--serve``): build the model once,
    restore ``--restore`` when given, then answer JSON-line requests on
    stdin until EOF (infer/server.py documents the protocol). New
    capability — the reference re-pays its per-window Python loop on
    every ``test()`` call (ref: model_utils.py:1067-1132); here the
    second request for a scene runs at the steady-state resident wall
    (perf/ROOFLINE.md cold-start decomposition). Returns the number of
    requests served."""
    import sys

    import jax
    import jax.numpy as jnp

    from ..infer.server import SceneServer
    from ..parallel.mesh import make_mesh
    from ..train import checkpoint as ckpt

    (img1, img2, gt, label_values, ignored_labels, rgb_bands,
     palette) = get_dataset(args.dataset, args.folder)
    n_classes = len(label_values)
    hyperparams = {k: v for k, v in vars(args).items() if v is not None}
    hyperparams.update({
        "n_classes": n_classes,
        "n_bands": (img1.shape[-1], img2.shape[-1]),
        "ignored_labels": list(ignored_labels), "dataset": args.dataset,
    })
    module, spec, hp = get_model(args.model, **hyperparams)

    mesh = None
    if not args.no_mesh and len(jax.devices()) > 1:
        mesh = make_mesh(args.n_devices)

    # init variables at the SERVED channel widths (PCA'd when the model
    # trains on PCA features — full_scene_probabilities re-applies the
    # same reduction per request), then overwrite from the checkpoint
    c1 = (int(hp["pca_components"]) if hp.get("applyPCA")
          else img1.shape[-1])
    p = int(hp["patch_size"])
    init_key = jax.random.PRNGKey(args.seed)
    dummy1 = jnp.zeros((2, p, p, c1), jnp.float32)
    dummy2 = jnp.zeros((2, p, p, img2.shape[-1]), jnp.float32)
    variables = jax.jit(module.init, static_argnames=("train",))(
        {"params": init_key, "dropout": init_key}, dummy1, dummy2,
        train=False)
    if args.restore:
        restored = ckpt.restore_checkpoint(args.restore, variables)
        variables = dict(variables, params=restored["params"])
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
    else:
        print("# --serve without --restore: serving an UNTRAINED "
              "{}".format(args.model), flush=True)

    server = SceneServer(module, variables, hp, mesh=mesh,
                         ignored_labels=ignored_labels,
                         chunk=args.infer_chunk)
    print('# ready: {} on {} — one JSON request per line, '
          '{{"cmd": "quit"}} ends'.format(args.model, args.dataset),
          flush=True)
    return server.loop(in_stream or sys.stdin, out_stream or sys.stdout,
                       img1, img2)


def _load_gt_pair(train_set: Optional[str], test_set: Optional[str],
                  gt: np.ndarray, sampling_mode: str, sample_pct: float,
                  split_seed: int):
    """Reproduce ref: main.py:379-394 (TRLabel/TSLabel fixed-split path)."""
    if train_set is not None and test_set is not None:
        train_gt = np.asarray(open_file(train_set)["TRLabel"])
        test_gt = np.asarray(open_file(test_set)["TSLabel"])
    elif train_set is not None:
        train_gt = np.asarray(open_file(train_set))
        test_gt = np.copy(gt)
        w, h = test_gt.shape
        test_gt[(train_gt > 0)[:w, :h]] = 0
    elif test_set is not None:
        test_gt = np.asarray(open_file(test_set))
        train_gt, _ = sample_gt(gt, sample_pct, mode=sampling_mode,
                                seed=split_seed)
    else:
        train_gt, test_gt = sample_gt(gt, sample_pct, mode=sampling_mode,
                                      seed=split_seed)
    return train_gt.astype(np.int64), test_gt.astype(np.int64)


def run_experiments(args) -> List[Dict]:
    """The reference's run loop (ref: main.py:377-552), TPU-native."""
    import jax

    from ..infer.fullscene import full_scene_probabilities
    from ..parallel.mesh import make_mesh
    from ..pipeline.patches import AugmentConfig, PatchPipeline
    from ..train import checkpoint as ckpt
    from ..train.loop import Trainer

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    if args.download:
        for ds in args.download:
            get_dataset(ds, args.folder)
        return []

    (img1, img2, gt, label_values, ignored_labels, rgb_bands,
     palette) = get_dataset(args.dataset, args.folder)
    if palette is None:
        palette = build_palette(len(label_values))

    writer = ArtifactWriter(os.path.join(
        args.out_dir, "{}_{}".format(args.dataset, args.model)))
    writer.save_dataset_rgb(img1, rgb_bands)
    writer.save_lidar(img2)
    writer.save_map(convert_to_color(gt, palette), "Ground truth")
    if args.with_exploration:
        writer.explore_spectrums(img1, gt, label_values, ignored_labels)

    n_classes = len(label_values)
    n_bands = (img1.shape[-1], img2.shape[-1])

    hyperparams = {k: v for k, v in vars(args).items() if v is not None}
    hyperparams.update({
        "n_classes": n_classes, "n_bands": n_bands,
        "ignored_labels": list(ignored_labels), "dataset": args.dataset,
    })

    mesh = None
    if not args.no_mesh and len(jax.devices()) > 1:
        mesh = make_mesh(args.n_devices)
        print("mesh: {} devices on 'data'".format(mesh.devices.size))

    n_runs = args.runs
    seeds = list(range(n_runs))
    # ref: main.py:378 seeds EVERY run with seed[2] (constant); guarded for
    # n_runs < 3 (where the reference would IndexError)
    parity_seed = seeds[2] if len(seeds) > 2 else seeds[-1]

    results: List[Dict] = []
    for run in range(n_runs):
        model_seed = parity_seed if args.strict_seed_parity else seeds[run]
        seed_everything(model_seed)
        train_gt, test_gt = _load_gt_pair(
            args.train_set, args.test_set, gt, args.sampling_mode,
            args.training_sample, split_seed=seeds[run])
        print("{} samples selected (over {})".format(
            np.count_nonzero(train_gt), np.count_nonzero(gt)))
        print("Running an experiment with the {} model".format(args.model),
              "run {}/{}".format(run + 1, n_runs))
        writer.save_map(convert_to_color(train_gt, palette),
                        "Train ground truth", run=run)
        writer.save_map(convert_to_color(test_gt, palette),
                        "Test ground truth", run=run)

        hp = dict(hyperparams)
        if args.class_balancing:
            hp["weights"] = compute_imf_weights(train_gt, n_classes,
                                                ignored_labels)
        module, spec, hp = get_model(args.model, **hp)

        if args.train_val_split != 1:
            train_gt_run, val_gt = sample_gt(train_gt, args.train_val_split,
                                             mode="random")
        else:
            train_gt_run, val_gt = train_gt, sample_gt(
                train_gt, 0.95, mode="random")[1]

        img1_model = img1
        if hp.get("applyPCA"):
            from ..data.normalize import apply_pca

            img1_model = apply_pca(img1, int(hp["pca_components"]))

        aug = AugmentConfig(flip=hp.get("flip_augmentation", False),
                            radiation=hp.get("radiation_augmentation", False),
                            mixture=hp.get("mixture_augmentation", False))
        pipe = PatchPipeline(img1_model, img2, train_gt_run,
                             hp["patch_size"], hp["ignored_labels"],
                             n_classes, augment=aug,
                             supervision=hp.get("supervision", "full"))
        val_pipe = PatchPipeline(img1_model, img2, val_gt, hp["patch_size"],
                                 hp["ignored_labels"], n_classes)
        print("超参数:\n", {k: v for k, v in hp.items()
                            if k not in ("weights",)})

        trainer = Trainer(module, hp, pipe, val_pipeline=val_pipe,
                          seed=model_seed, savename=args.model, mesh=mesh)
        if args.restore:
            restored = ckpt.restore_checkpoint(args.restore,
                                               trainer.state.variables)
            trainer.state = trainer.state.replace(
                params=restored["params"],
                batch_stats=restored.get("batch_stats", {}))

        profiling = bool(args.profile_dir) and run == 0
        if profiling:
            jax.profiler.start_trace(args.profile_dir)

        def on_epoch_end(e, l, m, _run=run):
            writer.log_scalars(e, {"loss": l, "val_metric": m}, run=_run)
            nonlocal profiling
            if profiling and e >= 1:       # trace covers the first epoch
                jax.profiler.stop_trace()
                profiling = False

        try:
            best_variables = trainer.fit(
                run=run, dataset_name=args.dataset,
                log_every=args.log_every, on_epoch_end=on_epoch_end)
        except KeyboardInterrupt:
            best_variables = jax.device_get(trainer.state.variables)
        finally:
            if profiling:
                jax.profiler.stop_trace()
                profiling = False

        probabilities = full_scene_probabilities(
            module, best_variables, img1, img2, hp,
            chunk=args.infer_chunk, mesh=mesh)
        prediction = np.argmax(probabilities, axis=-1)
        run_results = metrics(prediction, test_gt,
                              ignored_labels=hp["ignored_labels"],
                              n_classes=n_classes)

        writer.save_map(convert_to_color(prediction, palette),
                        "Prediction_All run{}".format(run))
        mask = np.zeros(gt.shape, dtype=bool)
        for l in ignored_labels:
            mask[gt == l] = True
        prediction[mask] = 0
        writer.save_map(convert_to_color(prediction, palette),
                        "Prediction run{}".format(run))
        writer.save_confusion_matrix(run_results["Confusion matrix"], run=run)

        results.append(run_results)
        text = show_results(run, run_results, label_values=label_values)
        writer.save_report(text)

    if n_runs > 1:
        text = show_results(n_runs - 1, results, label_values=label_values,
                            agregated=True)
        writer.save_report(text)
    return results


def _honor_jax_platforms_env():
    """Apply JAX_PLATFORMS via jax.config: on this deployment jax is
    pre-imported by a sitecustomize that pins the TPU plugin, so the env
    var alone is silently ignored (same reason tests/conftest.py uses
    config.update). Without this, `JAX_PLATFORMS=cpu python main.py ...`
    hangs trying to initialize an unreachable TPU backend."""
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        try:
            jax.config.update("jax_platforms", plats)
        except Exception:
            pass                      # backend already initialized


def main(argv=None):
    _honor_jax_platforms_env()
    args = build_parser().parse_args(argv)
    if args.pretrain:
        return run_pretrain(args)
    if args.serve:
        return run_serve(args)
    return run_experiments(args)
