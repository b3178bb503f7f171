"""Load and drive the ACTUAL reference harness (ref: model_utils.py
get_model/train/test, datasets.MultiModalX, utils.sample_gt/metrics) for
dual-harness accuracy-parity runs.

The reference tree is not importable as shipped (SURVEY.md §0): it imports
16 model modules that are absent, plus visdom/spectral/thop/mmengine/mmcv
which are not installed here. This module installs the MINIMUM stubs to
import it faithfully:

* absent-from-tree model modules -> placeholder classes (never constructed
  by the configs we drive);
* `model.changer.ChannelExchange` -> the Changer-paper semantics the
  reference relies on (swap every 2nd channel; same as our
  models/mm_mamba.py:channel_exchange), since the module is missing
  upstream but load-bearing for the flagship;
* mmengine/mmcv/mmpretrain -> just the five symbols Mutimodality_Mamba7.py
  actually touches (Config -> HF MambaConfig, ModuleList, trunc_normal_,
  PatchEmbed, build_norm_layer/to_2tuple/BaseBackbone/2d-sincos);
* visdom/spectral/thop -> inert modules (only display/profiling paths).

Everything that computes — the models, the train loop, the sliding-window
inference, the metrics — is the reference's own code, unmodified.
"""

import importlib.machinery
import importlib.util
import os
import sys
import types

REF = "/root/reference"


def _mod(name):
    m = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec() (used by e.g.
    # transformers' availability probes) accepts the stub
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = m
    return m


def _placeholder(*names):
    out = []
    for n in names:
        cls = type(n, (), {"__init__": lambda self, *a, **k: (_ for _ in ())
                           .throw(RuntimeError(n + " is absent upstream"))})
        out.append(cls)
    return out


def install_stubs():
    import torch
    import torch.nn as nn

    if "model.changer" in sys.modules:      # already installed
        return

    # --- inert externals -------------------------------------------------
    for name in ("spectral", "visdom", "torchvision", "torchsummary"):
        if name not in sys.modules:
            m = _mod(name)
            if name == "visdom":
                m.Visdom = object
            if name == "torchsummary":
                m.summary = lambda *a, **k: None
    if "thop" not in sys.modules:
        thop = _mod("thop")
        thop.profile = lambda *a, **k: (0, 0)
        thop.clever_format = lambda x, *a, **k: x
    if "timm" not in sys.modules:
        # only DropPath is imported, and only ever at drop rate 0
        # (ref: HSPT.py:3,326,342 -> identity)
        class DropPath(nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                assert drop_prob in (0, 0.0, None)

            def forward(self, x):
                return x

        timm = _mod("timm")
        timm_models = _mod("timm.models")
        timm_layers = _mod("timm.models.layers")
        timm_layers.DropPath = DropPath
        timm.models = timm_models
        timm_models.layers = timm_layers
    # scipy.misc was removed from modern scipy; utils.py imports it unused
    import scipy

    if not hasattr(scipy, "misc"):
        scipy.misc = _mod("scipy.misc")

    # --- mmengine / mmcv / mmpretrain minimal surface ---------------------
    from transformers.models.mamba.modeling_mamba import MambaConfig

    mmengine = _mod("mmengine")
    mmengine.Config = lambda d: MambaConfig(**dict(d))
    mm_model = _mod("mmengine.model")
    mm_model.ModuleList = nn.ModuleList
    mm_model.BaseModule = nn.Module
    mmengine.model = mm_model
    mm_wi = _mod("mmengine.model.weight_init")
    mm_wi.trunc_normal_ = torch.nn.init.trunc_normal_
    mm_model.weight_init = mm_wi

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    class PatchEmbed(nn.Module):
        """mmcv PatchEmbed for the reference's use: conv tokenizer returning
        (tokens, out_size) (ref: Mutimodality_Mamba7.py:247-259 passes
        kernel=stride=1, padding=0, bias=False, no norm)."""

        def __init__(self, in_channels, embed_dims, conv_type="Conv2d",
                     kernel_size=16, stride=16, padding=0, bias=True,
                     input_size=None, **kw):
            super().__init__()
            self.projection = nn.Conv2d(in_channels, embed_dims, kernel_size,
                                        stride, padding, bias=bias)
            ih, iw = to_2tuple(input_size)
            oh = (ih + 2 * padding - kernel_size) // stride + 1
            ow = (iw + 2 * padding - kernel_size) // stride + 1
            self.init_out_size = (oh, ow)

        def forward(self, x):
            x = self.projection(x)
            out_size = (x.shape[2], x.shape[3])
            return x.flatten(2).transpose(1, 2), out_size

    mmcv = _mod("mmcv")
    mmcv_cnn = _mod("mmcv.cnn")
    mmcv_bricks = _mod("mmcv.cnn.bricks")
    mmcv_tr = _mod("mmcv.cnn.bricks.transformer")
    mmcv_tr.PatchEmbed = PatchEmbed
    mmcv.cnn = mmcv_cnn
    mmcv_cnn.bricks = mmcv_bricks
    mmcv_bricks.transformer = mmcv_tr

    class BaseBackbone(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    def build_norm_layer(cfg, dim):
        assert cfg.get("type", "LN") == "LN"
        return nn.LayerNorm(dim, eps=cfg.get("eps", 1e-5))

    def build_2d_sincos_position_embedding(patches_resolution, embed_dims,
                                           temperature=10000.0,
                                           cls_token=False):
        # verbatim math of ref: mmpretrain/models/utils/position_encoding.py
        h, w = to_2tuple(patches_resolution)
        grid_w = torch.arange(w, dtype=torch.float32)
        grid_h = torch.arange(h, dtype=torch.float32)
        grid_w, grid_h = torch.meshgrid(grid_w, grid_h, indexing="ij")
        pos_dim = embed_dims // 4
        omega = torch.arange(pos_dim, dtype=torch.float32) / pos_dim
        omega = 1.0 / (temperature ** omega)
        out_w = torch.einsum("m,d->md", [grid_w.flatten(), omega])
        out_h = torch.einsum("m,d->md", [grid_h.flatten(), omega])
        pe = torch.cat([torch.sin(out_w), torch.cos(out_w),
                        torch.sin(out_h), torch.cos(out_h)], dim=1)[None]
        if cls_token:
            pe = torch.cat([torch.zeros(1, 1, embed_dims), pe], dim=1)
        return pe

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls

            return deco

    mp = _mod("mmpretrain")
    mp_models = _mod("mmpretrain.models")
    mp_utils = _mod("mmpretrain.models.utils")
    mp_pe = _mod("mmpretrain.models.utils.position_encoding")
    mp_pe.build_2d_sincos_position_embedding = \
        build_2d_sincos_position_embedding
    mp_helpers = _mod("mmpretrain.models.utils.helpers")
    mp_helpers.to_2tuple = to_2tuple
    mp_norm = _mod("mmpretrain.models.utils.norm")
    mp_norm.build_norm_layer = build_norm_layer
    mp_bb = _mod("mmpretrain.models.backbones")
    mp_bbb = _mod("mmpretrain.models.backbones.base_backbone")
    mp_bbb.BaseBackbone = BaseBackbone
    mp_reg = _mod("mmpretrain.registry")
    mp_reg.MODELS = _Registry()
    mp.models = mp_models
    mp.registry = mp_reg

    # --- missing in-tree model modules ------------------------------------
    class ChannelExchange(nn.Module):
        """Changer-paper semantics: swap every p-th channel when the two
        maps agree in channel count (the reference imports this from the
        absent model.changer; guard at Mutimodality_Mamba7.py:1134-1135)."""

        def __init__(self, p=2):
            super().__init__()
            self.p = p

        def forward(self, x1, x2):
            c = x1.shape[1]
            import torch as _t

            mask = (_t.arange(c) % self.p == 0).view(1, -1, 1, 1)
            return _t.where(mask, x2, x1), _t.where(mask, x1, x2)

    changer = _mod("model.changer")
    changer.ChannelExchange = ChannelExchange
    (changer.SpatialExchange, changer.ChannelInsert) = _placeholder(
        "SpatialExchange", "ChannelInsert")

    missing = {
        "model.CascadeMamba": ["CascadeRSMamba_complete"],
        "model.FICNN_VIT": ["FICNN_VIT"],
        "model.HybridSN": ["HybridSN"],
        "model.RSMamba": ["RSMamba_complete"],
        "model.SupConResNet": ["SupConResNet"],
        "model.Selective": [],
        "model.Selective.fasternet": ["FasterNet"],
        "model.S2ENet": ["S2ENet"],
        "model.FI_CNN": ["FI_CNN"],
        "model.ResNet18": ["ResNet18"],
        "model.S2ENet_ResNet18": ["S2ENet_ResNet18"],
        "model.multiScaleCNN": ["multiScaleCNN"],
        "model.FI_CNN3D": ["FI_CNN3D"],
        "model.VIT": ["VIT"],
        "model.proposed": ["proposed"],
        "model.nncnet": ["moco_based_NNCNet"],
    }
    for name, symbols in missing.items():
        m = _mod(name)
        for s, cls in zip(symbols, _placeholder(*symbols)):
            setattr(m, s, cls)

    # S2ENet: source missing upstream (only a py3.9 .pyc). For dual-harness
    # runs the "reference" is the torch reconstruction from the pyc string
    # table (== the public MMRS S2ENet; see tests/test_glt_s2enet_parity.py
    # which also proves our flax model matches it) — same ctor signature as
    # the registry call (ref: model_utils.py:132).
    try:
        from test_glt_s2enet_parity import _TorchS2ENet

        sys.modules["model.S2ENet"].S2ENet = _TorchS2ENet
    except Exception:
        pass      # parity-test module unavailable: placeholder stays


_loaded = {}


def load_reference():
    """Import the reference's utils/datasets/model_utils (cached)."""
    if _loaded:
        return _loaded["utils"], _loaded["datasets"], _loaded["model_utils"]
    install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("utils", "datasets", "losses", "model_utils"):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF, name + ".py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        _loaded[name] = mod
    _repair_fusatnet_inplace()
    return _loaded["utils"], _loaded["datasets"], _loaded["model_utils"]


def _repair_fusatnet_inplace():
    """The reference FusAtNet residual units do ``x += identity`` where
    both tensors are ReLU OUTPUTS saved for backward — loss.backward()
    raises 'modified by an inplace operation' under every torch version
    that checks tensor versions (verified on this host, 2026-08-17):
    the model is untrainable as shipped, like S2EFT (QUIRKS.md). Minimal
    repair for the dual harness: the same add, out of place. Forward
    numerics are bit-identical."""
    mod = sys.modules.get("model.compare_method.FusAtNet")
    if mod is None:
        try:
            import model.compare_method.FusAtNet as mod  # noqa: F811
        except Exception:
            return

    def fwd1(self, x):
        x = self.activation(self.bn1(self.conv1(x)))
        identity = x
        x = self.activation(self.bn2(self.conv2(x)))
        x = x + identity
        return self.max_pool(x)

    def fwd2(self, x):
        x = self.activation(self.bn1(self.conv1(x)))
        identity = x
        x = self.activation(self.bn2(self.conv2(x)))
        return x + identity

    mod.Residual_Unit1.forward = fwd1
    mod.Residual_Unit2.forward = fwd2


class neutralize_cuda:
    """Context manager mapping hardcoded CUDA placements to CPU for the
    reference run: TokenLearner does `.to("cuda:0")`
    (ref: Mutimodality_Mamba7.py:60) and SA_GDR does `.cuda()`
    (ref: GLT_Net.py:193) — both crash on a CPU-only torch build."""

    def __enter__(self):
        import torch

        self._to = torch.Tensor.to
        self._cuda = torch.Tensor.cuda
        orig_to = self._to

        def to_cpu(t, *args, **kw):
            args = tuple(
                "cpu" if (isinstance(a, (str, torch.device))
                          and "cuda" in str(a)) else a for a in args)
            return orig_to(t, *args, **kw)

        torch.Tensor.to = to_cpu
        torch.Tensor.cuda = lambda t, *a, **k: t
        return self

    def __exit__(self, *exc):
        import torch

        torch.Tensor.to = self._to
        torch.Tensor.cuda = self._cuda
        return False


def run_reference_experiment(name, img1, img2, train_gt, val_gt, test_gt,
                             seed=0, **hp_overrides):
    """The reference's own main.py flow (ref: main.py:377-519): get_model ->
    DataLoader(MultiModalX) -> train -> load best -> test -> metrics.
    Returns the reference metrics dict (utils.metrics)."""
    import torch

    r_utils, r_datasets, r_mu = load_reference()

    n_classes = int(max(train_gt.max(), test_gt.max())) + 1
    hp = {
        "dataset": "Synthetic", "n_classes": n_classes,
        "n_bands": (img1.shape[-1], img2.shape[-1]), "ignored_labels": [0],
        "flip_augmentation": False, "radiation_augmentation": False,
        "mixture_augmentation": False, "supervision": "full",
        "test_stride": 1, "center_pixel": True,
    }
    hp.update(hp_overrides)
    r_utils.seed_torch(seed=seed)
    model, optimizer, criterion, hp = r_mu.get_model(name, **hp)

    # PCA models (HCTnet): the reference's main.py reduces img1 before
    # building datasets; use the same apply_pca as our harness so both
    # sides see IDENTICAL input data
    if hp.get("applyPCA"):
        from vit_cnn_tpu.data.normalize import apply_pca

        # the reference hardcodes n_bands = 30 for its PCA models
        # (model_utils.py:356-357) and never defines pca_components
        img1 = apply_pca(img1, hp.get("pca_components", 30))
        hp["n_bands"] = (img1.shape[-1], hp["n_bands"][1])

    train_ds = r_datasets.MultiModalX(img1, img2, train_gt, **hp)
    g = torch.Generator()
    g.manual_seed(seed)
    # the MDL-Hong heads `torch.squeeze` their logits (DML_Hong.py:62,139,
    # 223,320-322), which collapses the batch dim — a genuine reference
    # crash whenever the trailing batch has exactly 1 sample; drop it
    drop_last = len(train_ds) % hp["batch_size"] == 1
    train_loader = torch.utils.data.DataLoader(
        train_ds, batch_size=hp["batch_size"], shuffle=True, generator=g,
        drop_last=drop_last)
    val_ds = r_datasets.MultiModalX(img1, img2, val_gt, **hp)
    val_loader = torch.utils.data.DataLoader(
        val_ds, batch_size=hp["batch_size"])

    with neutralize_cuda():
        best = r_mu.train("", 0, hp["n_bands"][0], model, optimizer,
                          criterion, train_loader, hp["epoch"],
                          scheduler=hp.get("scheduler"), display_iter=0,
                          device=hp["device"], display=None,
                          val_loader=val_loader,
                          supervision=hp["supervision"])
        model.load_state_dict(best)
        probs = r_mu.test(0, model, img1, img2, hp)
    prediction = probs.argmax(axis=-1)
    return r_utils.metrics(prediction, test_gt,
                           ignored_labels=hp["ignored_labels"],
                           n_classes=n_classes)


def run_our_experiment(name, img1, img2, train_gt, val_gt, test_gt, seed=0,
                       **hp_overrides):
    """The same experiment through our harness (registry -> PatchPipeline ->
    Trainer -> full_scene_probabilities -> metrics)."""
    from vit_cnn_tpu.data.normalize import apply_pca
    from vit_cnn_tpu.infer import full_scene_probabilities
    from vit_cnn_tpu.metrics.classification import metrics as our_metrics
    from vit_cnn_tpu.models import get_model
    from vit_cnn_tpu.pipeline import AugmentConfig, PatchPipeline
    from vit_cnn_tpu.train import Trainer

    n_classes = int(max(train_gt.max(), test_gt.max())) + 1
    hp = {"n_classes": n_classes,
          "n_bands": (img1.shape[-1], img2.shape[-1]),
          "ignored_labels": [0], "dataset": "Synthetic", "test_stride": 1}
    hp.update(hp_overrides)
    module, spec, hp = get_model(name, **hp)

    img1_model = img1
    if hp.get("applyPCA"):
        img1_model = apply_pca(img1, hp["pca_components"])

    pipe = PatchPipeline(img1_model, img2, train_gt, hp["patch_size"],
                         hp["ignored_labels"], hp["n_classes"],
                         augment=AugmentConfig())
    val_pipe = PatchPipeline(img1_model, img2, val_gt, hp["patch_size"],
                             hp["ignored_labels"], hp["n_classes"],
                             augment=AugmentConfig())
    trainer = Trainer(module, hp, pipe, val_pipeline=val_pipe, seed=seed,
                      save_checkpoints=False)
    best = trainer.fit(run=0, dataset_name="Synthetic")
    probs = full_scene_probabilities(module, best, img1, img2, hp, chunk=512)
    prediction = probs.argmax(axis=-1)
    return our_metrics(prediction, test_gt,
                       ignored_labels=hp["ignored_labels"],
                       n_classes=n_classes)
