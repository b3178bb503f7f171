"""Root-cause the HCTnet dual-harness offset (VERDICT r3 missing #4).

DUAL_HARNESS.md shows tight but DISJOINT 3-seed OA bands: ref
51.04+-0.28 [50.69,51.38] vs ours 54.61+-0.16 — ours consistently +3.5.
Two framework-level hypotheses and one data-level one:

  (data) the reference pipeline applies PCA TWICE: the harness reduces
         the scene to whitened PCA-30 (model_utils.py:355-357), then
         MultiModalX re-applies whitened PCA-3 INTERNALLY
         (datasets.py:507-508) and test() does the same
         (model_utils.py:1076-1077). PCA of already-whitened data has an
         isotropic covariance, so "top-3" is an essentially arbitrary
         3-dim projection — very different data from our side's single
         consistent PCA-30 (QUIRKS.md #4). A direct ours@PCA-3 run
         (54.21+-0.08) already showed 3-vs-30 WIDTH is not the cause;
         this probe feeds our harness the ref's exact DOUBLE-PCA data.
  (init) torch's layer-default inits (kaiming-uniform linear/conv with
         a=sqrt(5), uniform bias) vs our flax/ref-documented inits,
         compounded over 100 epochs on a micro-scene.
  (dyn)  remaining RNG-stream differences (dropout, shuffle order).

Arms (all on the identical scene/split as perf/dual_harness.py):
  A: our harness, our init, on apply_pca(apply_pca(img, 30), 3) — the
     data the reference model actually saw.
  B: our harness on the same data, but starting from the TORCH model's
     init (seed_torch(s) -> get_model -> state-dict transplant, the
     exact mapping test_reference_parity.py:test_hctnet_forward_parity
     pins to 1e-3).

Reading: A in ref band  -> the offset is the double-PCA data quirk.
         B in ref band (A not) -> init distributions.
         neither          -> training-dynamics (RNG streams) residual.

Usage: python perf/hctnet_offset_probe.py [seeds]   (CPU, ~15 min)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_cache_dir = os.path.expanduser("~/.cache/vct_jax_cache_cpu")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

REF_BAND = "51.04+-0.28 [50.69,51.38]"   # DUAL_HARNESS.md, 3 ref seeds


def transplant_hctnet(sd):
    """Torch HCTnet state_dict -> our flax (params, batch_stats).

    Same mapping as tests/test_reference_parity.py:test_hctnet_forward_parity
    (pinned there to 1e-3 vs the torch forward); depth=1 models only.
    """
    from test_reference_parity import _bn, _conv, _lin, _t2j

    params, stats = {}, {}
    params["conv3d"] = {
        "kernel": _t2j(sd["conv3d_features.0.weight"]).transpose(2, 3, 4, 1, 0),
        "bias": _t2j(sd["conv3d_features.0.bias"])}
    params["bn3d"], stats["bn3d"] = _bn(sd, "conv3d_features.1")
    params["conv2d"] = _conv(sd, "conv2d_features.0")
    params["bn2d"], stats["bn2d"] = _bn(sd, "conv2d_features.1")
    params["conv2d_l"] = _conv(sd, "conv2d_features2.0")
    params["bn2d_l"], stats["bn2d_l"] = _bn(sd, "conv2d_features2.1")
    params["token_wA"] = _t2j(sd["token_wA"])[0]
    params["token_wV"] = _t2j(sd["token_wV"])[0]
    params["cls_token"] = _t2j(sd["cls_token"])
    params["pos_embedding"] = _t2j(sd["pos_embedding"])
    params["head_norm"] = {"scale": _t2j(sd["mlp_head.0.weight"]),
                           "bias": _t2j(sd["mlp_head.0.bias"])}
    params["head"] = _lin(sd, "mlp_head.1")
    for enc, name in (("0", "h_enc0"), ("1", "l_enc0")):
        pre = "fusion_encoder.layers.0.{}.layers.0.".format(enc)
        params[name] = {
            "attn_norm0": {"scale": _t2j(sd[pre + "0.fn.norm.weight"]),
                           "bias": _t2j(sd[pre + "0.fn.norm.bias"])},
            "attn0": {"to_qkv": _lin(sd, pre + "0.fn.fn.to_qkv"),
                      "nn1": _lin(sd, pre + "0.fn.fn.nn1")},
            "mlp_norm0": {"scale": _t2j(sd[pre + "1.fn.norm.weight"]),
                          "bias": _t2j(sd[pre + "1.fn.norm.bias"])},
            "mlp0": {"Dense_0": _lin(sd, pre + "1.fn.fn.net.0"),
                     "Dense_1": _lin(sd, pre + "1.fn.fn.net.3")},
        }
    for ct, norm_name, attn_name in (("0", "ct_h_norm0", "ct_h0"),
                                     ("1", "ct_l_norm0", "ct_l0")):
        pre = "fusion_encoder.layers.0.2.layers.0.{}.fn.".format(ct)
        params[norm_name] = {"scale": _t2j(sd[pre + "norm.weight"]),
                             "bias": _t2j(sd[pre + "norm.bias"])}
        params[attn_name] = {
            "to_q": {"kernel": _t2j(sd[pre + "fn.to_q.weight"]).T},
            "to_kv": {"kernel": _t2j(sd[pre + "fn.to_kv.weight"]).T},
            "to_out": _lin(sd, pre + "fn.to_out.0")}
    return params, stats


def torch_init_variables(seed, n_classes, template):
    """seed_torch(seed) -> reference get_model('HCTnet') -> transplant.

    `template` is a flax variables tree from module.init; the transplant
    must match its structure exactly (verified leaf-by-leaf)."""
    from ref_harness import load_reference

    r_utils, _, r_mu = load_reference()
    r_utils.seed_torch(seed=seed)
    model, _, _, _ = r_mu.get_model(
        "HCTnet", dataset="Synthetic", n_classes=n_classes, n_bands=(40, 1),
        ignored_labels=[0], flip_augmentation=False,
        radiation_augmentation=False, mixture_augmentation=False,
        supervision="full", test_stride=1, center_pixel=True)
    params, stats = transplant_hctnet(model.state_dict())
    variables = {"params": params, "batch_stats": stats}
    t_leaves, t_def = jax.tree_util.tree_flatten(template)
    leaves, tdef = jax.tree_util.tree_flatten(variables)
    assert tdef == t_def, "transplant/init structure mismatch:\n{}\nvs\n{}".format(
        tdef, t_def)
    for a, b in zip(leaves, t_leaves):
        assert a.shape == b.shape, (a.shape, b.shape)
    return variables


def run_ours(module, hp, img_model, img2, train_gt, val_gt, test_gt, seed,
             init_variables=None):
    from vit_cnn_tpu.infer import full_scene_probabilities
    from vit_cnn_tpu.metrics.classification import metrics as our_metrics
    from vit_cnn_tpu.pipeline import AugmentConfig, PatchPipeline
    from vit_cnn_tpu.train import Trainer
    from vit_cnn_tpu.train.state import TrainState

    pipe = PatchPipeline(img_model, img2, train_gt, hp["patch_size"],
                         hp["ignored_labels"], hp["n_classes"],
                         augment=AugmentConfig())
    val_pipe = PatchPipeline(img_model, img2, val_gt, hp["patch_size"],
                             hp["ignored_labels"], hp["n_classes"],
                             augment=AugmentConfig())
    trainer = Trainer(module, hp, pipe, val_pipeline=val_pipe, seed=seed,
                      save_checkpoints=False)
    if init_variables is not None:
        init_variables = jax.tree_util.tree_map(
            lambda t, s: np.asarray(s, dtype=t.dtype),
            trainer.state.variables, init_variables)
        trainer.state = TrainState.create_from_variables(
            module.apply, init_variables, trainer.tx)
    best = trainer.fit(run=0, dataset_name="Synthetic")
    probs = full_scene_probabilities(module, best, img_model, img2, hp,
                                     chunk=512)
    prediction = probs.argmax(axis=-1)
    return our_metrics(prediction, test_gt,
                       ignored_labels=hp["ignored_labels"],
                       n_classes=hp["n_classes"])


def main():
    from vit_cnn_tpu.data.normalize import apply_pca
    from vit_cnn_tpu.data.sampling import sample_gt
    from vit_cnn_tpu.models import get_model
    from vit_cnn_tpu.models.hctnet import HCTnet

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    # identical scene + split to perf/dual_harness.py's HCTnet row
    os.environ.update(VCT_SYN_H="40", VCT_SYN_W="40", VCT_SYN_BANDS="40",
                      VCT_SYN_CLASSES="5")
    from vit_cnn_tpu.data.registry import _synthetic_loader

    img1, img2, gt = _synthetic_loader("")
    for k in ("VCT_SYN_H", "VCT_SYN_W", "VCT_SYN_BANDS", "VCT_SYN_CLASSES"):
        os.environ.pop(k, None)
    np.random.seed(0)
    train_gt, test_gt = sample_gt(gt, 0.6, mode="random", seed=0)
    train_gt, val_gt = sample_gt(train_gt, 0.8, mode="random", seed=1)

    # the data the REFERENCE model actually saw: whitened PCA-30 by the
    # harness, then whitened PCA-3 inside MultiModalX/test()
    img_ref3 = apply_pca(apply_pca(img1, 30), 3)

    # our hyperparams, with PCA handled OUTSIDE (data pre-reduced)
    _, _, hp = get_model("HCTnet", dataset="Synthetic", n_classes=5,
                         n_bands=(40, 1), ignored_labels=[0],
                         test_stride=1)
    hp["applyPCA"] = False
    hp["n_bands"] = (img_ref3.shape[-1], img2.shape[-1])
    module = HCTnet(n_bands1=img_ref3.shape[-1], n_bands2=img2.shape[-1],
                    n_classes=5, num_tokens=6, heads=8)

    template = None
    results = {"A(ours-init @ ref double-PCA data)": [],
               "B(torch-init @ ref double-PCA data)": []}
    for seed in range(n_seeds):
        t0 = time.time()
        m = run_ours(module, hp, img_ref3, img2, train_gt, val_gt, test_gt,
                     seed)
        results["A(ours-init @ ref double-PCA data)"].append(m["Accuracy"])
        print("A seed {}: OA={:.2f} ({:.0f}s)".format(
            seed, m["Accuracy"], time.time() - t0), flush=True)
    for seed in range(n_seeds):
        t0 = time.time()
        if template is None:
            import jax.numpy as jnp

            p = int(hp["patch_size"])
            template = jax.jit(module.init, static_argnames=("train",))(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(0)},
                jnp.zeros((2, p, p, img_ref3.shape[-1]), jnp.float32),
                jnp.zeros((2, p, p, img2.shape[-1]), jnp.float32),
                train=False)
        init_vars = torch_init_variables(seed, 5, template)
        m = run_ours(module, hp, img_ref3, img2, train_gt, val_gt, test_gt,
                     seed, init_variables=init_vars)
        results["B(torch-init @ ref double-PCA data)"].append(m["Accuracy"])
        print("B seed {}: OA={:.2f} ({:.0f}s)".format(
            seed, m["Accuracy"], time.time() - t0), flush=True)

    print("\nref band (DUAL_HARNESS.md):", REF_BAND)
    print("ours@PCA-30 band:            54.61+-0.16 [54.50,54.84]")
    for arm, oas in results.items():
        print("{}: {:.2f}+-{:.2f} [{:.2f},{:.2f}]".format(
            arm, np.mean(oas), np.std(oas), min(oas), max(oas)))


if __name__ == "__main__":
    main()
