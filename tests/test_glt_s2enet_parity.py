"""Transplanted-weight parity for the two models that previously rested on
smoke tests only (VERDICT r1 weak #5):

* GLT-Net — the torch source is present and its 6-input forward is runnable
  (ref: model/compare_method/GLT_Net/GLT_Net.py:310-422) even though the
  2-arg harness can never drive it (ref: main.py:110). We feed the
  reference the SAME three-scale pyramid our adaptation derives internally
  and compare (logits, con_loss).
* S2ENet — source missing upstream (only model/__pycache__/
  S2ENet.cpython-39.pyc, unloadable under py3.12). The torch model below is
  reconstructed from the pyc string table (module names, attribute order,
  forward opcodes: view/permute/matmul/expand_as/Affinity_M/dim_reduce),
  which identifies it as the public MMRS S2ENet; parity is vs that
  reconstruction.
"""

import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

torch = pytest.importorskip("torch")


def _load_ref(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _t2j(t):
    return np.asarray(t.detach().numpy())


def _lin(sd, prefix):
    return {"kernel": _t2j(sd[prefix + ".weight"]).T,
            "bias": _t2j(sd[prefix + ".bias"])}


def _conv(sd, prefix):
    out = {"kernel": _t2j(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t2j(sd[prefix + ".bias"])
    return out


def _bn(sd, prefix):
    return ({"bn": {"scale": _t2j(sd[prefix + ".weight"]),
                    "bias": _t2j(sd[prefix + ".bias"])}},
            {"bn": {"mean": _t2j(sd[prefix + ".running_mean"]),
                    "var": _t2j(sd[prefix + ".running_var"])}})


def _ln(sd, prefix):
    return {"scale": _t2j(sd[prefix + ".weight"]),
            "bias": _t2j(sd[prefix + ".bias"])}


def _randomize_bn_stats(net, rng):
    for m in net.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(torch.tensor(
                rng.randn(m.num_features).astype("float32") * 0.2))
            m.running_var.copy_(torch.tensor(
                1.0 + 0.3 * rng.rand(m.num_features).astype("float32")))


def _vit_backbone(sd, prefix, depth):
    """torch GLT Transformer -> our ViTBackbone param tree."""
    tr = {}
    for l in range(depth):
        pre = "{}.layers.{}.".format(prefix, l)
        tr["attn_norm{}".format(l)] = _ln(sd, pre + "0.fn.norm")
        tr["attn{}".format(l)] = {
            "to_qkv": {"kernel": _t2j(sd[pre + "0.fn.fn.to_qkv.weight"]).T},
            "to_out": _lin(sd, pre + "0.fn.fn.to_out.0")}
        tr["ff_norm{}".format(l)] = _ln(sd, pre + "1.fn.norm")
        tr["ff{}".format(l)] = {"Dense_0": _lin(sd, pre + "1.fn.fn.net.0"),
                                "Dense_1": _lin(sd, pre + "1.fn.fn.net.3")}
    return tr


def test_glt_net_forward_parity():
    import jax
    import jax.numpy as jnp

    from vit_cnn_tpu.models.glt_net import GLTNet

    ref = _load_ref("model/compare_method/GLT_Net/GLT_Net.py", "ref_glt")
    rng = np.random.RandomState(11)
    bands, bands2, K, B, P = 12, 2, 5, 2, 8
    en_depth = de_depth = 2          # registry uses 5; 2 keeps the test fast
    net = ref.GLT(l1=bands, l2=bands2, patch_size=P, num_patches=64,
                  num_classes=K, encoder_embed_dim=64, decoder_embed_dim=32,
                  en_depth=en_depth, en_heads=4, de_depth=de_depth,
                  de_heads=4, mlp_dim=8, dropout=0.0, emb_dropout=0.0).eval()
    with torch.no_grad():
        _randomize_bn_stats(net, rng)
    sd = net.state_dict()

    params, stats = {}, {}

    def cbr(name, conv_pre, bn_pre):
        p, s = _bn(sd, bn_pre)
        params[name] = {"Conv_0": _conv(sd, conv_pre), "BatchNorm_0": p}
        stats[name] = {"BatchNorm_0": s}

    cbr("stem_hsi", "cnn_encoder.conv1.0", "cnn_encoder.conv1.1")
    cbr("stem_lidar", "cnn_encoder.conv2.0", "cnn_encoder.conv2.1")
    for i in range(3):
        cbr("tower_hsi{}".format(i), "cnn_encoder.conv1_{}.0".format(i + 1),
            "cnn_encoder.conv1_{}.1".format(i + 1))
        cbr("tower_lidar{}".format(i), "cnn_encoder.conv2_{}.0".format(i + 1),
            "cnn_encoder.conv2_{}.1".format(i + 1))
    params["xishu1"] = _t2j(sd["cnn_encoder.xishu1"])
    params["xishu2"] = _t2j(sd["cnn_encoder.xishu2"])
    for i in (1, 2, 3):
        params["encoder_embedding{}".format(i)] = _lin(
            sd, "encoder_embedding{}".format(i))
    params["sa_gdr"] = {"conv": {
        "kernel": _t2j(sd["sa_gdr.conv.weight"]).transpose(2, 3, 1, 0)}}
    params["encoder_pos_embed"] = _t2j(sd["encoder_pos_embed"])
    params["cls_token"] = _t2j(sd["cls_token"])
    params["en_transformer"] = _vit_backbone(sd, "en_transformer", en_depth)
    params["decoder_embedding"] = _lin(sd, "decoder_embedding")
    params["decoder_pos_embed"] = _t2j(sd["decoder_pos_embed"])
    params["de_transformer"] = _vit_backbone(sd, "de_transformer", de_depth)
    params["decoder_pred1"] = _lin(sd, "decoder_pred1")
    # six reconstruction convs: dconv1/2 are Sequential[conv], 3-6 have a
    # leading Upsample so the conv sits at index 1
    for i, idx in ((1, 0), (2, 0), (3, 1), (4, 1), (5, 1), (6, 1)):
        params["dconv{}".format(i)] = _conv(
            sd, "cnn_decoder.dconv{}.{}".format(i, idx))
    p, s = _bn(sd, "cnn_classifier.conv1.1")
    params["cls_conv1"] = _conv(sd, "cnn_classifier.conv1.0")
    params["cls_bn1"], stats["cls_bn1"] = p, s
    w = _t2j(sd["cnn_classifier.conv2.0.weight"])[:, :, 0, 0]
    params["cls_conv2"] = {"kernel": w.T,
                           "bias": _t2j(sd["cnn_classifier.conv2.0.bias"])}
    params["head_norm"] = _ln(sd, "mlp_head.0")
    params["head"] = _lin(sd, "mlp_head.1")
    params["coefficient1"] = _t2j(sd["coefficient1"])
    params["coefficient2"] = _t2j(sd["coefficient2"])

    # our model derives the (P, 2P, 3P) pyramid internally via
    # jax.image.resize; feed the reference the identical arrays
    x1 = rng.randn(B, P, P, bands).astype("float32")
    x2 = rng.randn(B, P, P, bands2).astype("float32")

    def pyramid(x):
        return [np.asarray(jax.image.resize(
            jnp.asarray(x), (B, s * P, s * P, x.shape[-1]), "bilinear"))
            for s in (1, 2, 3)]

    s1, s2 = pyramid(x1), pyramid(x2)
    t_in = [torch.from_numpy(a.transpose(0, 3, 1, 2))
            for pair in zip(s1, s2) for a in pair]

    # SA_GDR hardcodes .cuda() (ref: :193) — neutralize for the CPU run
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        with torch.no_grad():
            t_cls, t_loss = net(*t_in)
    finally:
        torch.Tensor.cuda = orig_cuda

    ours = GLTNet(n_bands1=bands, n_bands2=bands2, patch_size=P,
                  num_patches=64, n_classes=K, en_depth=en_depth,
                  de_depth=de_depth, dropout=0.0, emb_dropout=0.0)
    j_cls, j_loss = ours.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x1), jnp.asarray(x2), train=False)
    np.testing.assert_allclose(np.asarray(j_cls), _t2j(t_cls),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(j_loss), float(t_loss),
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# S2ENet reconstruction (from the pyc string table / public MMRS S2ENet)
# ---------------------------------------------------------------------------

class _TorchSAEM(torch.nn.Module):
    def __init__(self, in_channels, inter_channels, size):
        super().__init__()
        self.inter_channels = inter_channels
        nn = torch.nn
        self.T1 = nn.Sequential(nn.Conv2d(in_channels, inter_channels, 1),
                                nn.BatchNorm2d(inter_channels), nn.Sigmoid())
        self.T2 = nn.Sequential(nn.Conv2d(in_channels, inter_channels, 1),
                                nn.BatchNorm2d(inter_channels), nn.Sigmoid())
        self.dim_reduce = nn.Sequential(
            nn.Conv1d(size * size, 1, kernel_size=1, bias=False))

    def forward(self, x1, x2):
        b = x1.size(0)
        t1 = self.T1(x1).view(b, self.inter_channels, -1).permute(0, 2, 1)
        t2 = self.T2(x2).view(b, self.inter_channels, -1)
        aff = torch.matmul(t1, t2)             # (B, HW1, HW2)
        aff = aff.permute(0, 2, 1)             # (B, HW2, HW1)
        aff = self.dim_reduce(aff)             # (B, 1, HW1)
        aff = aff.view(b, 1, x1.shape[2], x1.shape[3])
        return x1 * aff.expand_as(x1)


class _TorchSEEM(torch.nn.Module):
    def __init__(self, in_channels, in_channels2):
        super().__init__()
        self.c1, self.c2 = in_channels, in_channels2
        nn = torch.nn
        self.T1 = nn.Sequential(nn.Conv2d(in_channels, in_channels, 1),
                                nn.BatchNorm2d(in_channels), nn.Sigmoid())
        self.T2 = nn.Sequential(nn.Conv2d(in_channels2, in_channels2, 1),
                                nn.BatchNorm2d(in_channels2), nn.Sigmoid())
        self.dim_reduce = nn.Sequential(
            nn.Conv1d(in_channels2, 1, kernel_size=1, bias=False))

    def forward(self, x1, x2):
        b = x1.size(0)
        t1 = self.T1(x1).view(b, self.c1, -1)                  # (B, C1, HW)
        t2 = self.T2(x2).view(b, self.c2, -1).permute(0, 2, 1)  # (B, HW, C2)
        aff = torch.matmul(t1, t2)             # (B, C1, C2)
        aff = aff.permute(0, 2, 1)             # (B, C2, C1)
        aff = self.dim_reduce(aff)             # (B, 1, C1)
        aff = aff.view(b, x1.shape[1], 1, 1)
        return x1 * aff.expand_as(x1)


class _TorchCBR(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        nn = torch.nn
        self.conv = nn.Conv2d(cin, cout, 3, padding=1)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class _TorchS2ENet(torch.nn.Module):
    def __init__(self, bands, bands2, K, patch_size):
        super().__init__()
        nn = torch.nn
        pa, pb = [128, 64, 32], [8, 16, 32]
        self.conv1_a = _TorchCBR(bands, pa[0])
        self.conv1_b = _TorchCBR(bands2, pb[0])
        self.conv2_a = _TorchCBR(pa[0], pa[1])
        self.conv2_b = _TorchCBR(pb[0], pb[1])
        self.conv3_a = _TorchCBR(pa[1], pa[2])
        self.conv3_b = _TorchCBR(pb[1], pb[2])
        self.SAEM = _TorchSAEM(pa[2], pa[2] // 2, patch_size)
        self.SEEM = _TorchSEEM(pb[2], pa[2])
        self.FusionLayer = nn.Sequential(
            nn.Conv2d(pa[2] * 2, pa[2], 1), nn.BatchNorm2d(pa[2]),
            nn.ReLU())
        self.fc = nn.Linear(pa[2], K)

    def forward(self, x1, x2):
        x1 = self.conv3_a(self.conv2_a(self.conv1_a(x1)))
        x2 = self.conv3_b(self.conv2_b(self.conv1_b(x2)))
        ss1 = self.SAEM(x1, x2)
        ss2 = self.SEEM(x2, x1)
        x = self.FusionLayer(torch.cat((ss1, ss2), 1))
        x = torch.nn.functional.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.fc(x)


def test_s2enet_forward_parity():
    import jax.numpy as jnp

    from vit_cnn_tpu.models.s2enet import S2ENet

    rng = np.random.RandomState(12)
    bands, bands2, K, B, P = 10, 2, 5, 3, 7
    net = _TorchS2ENet(bands, bands2, K, P).eval()
    with torch.no_grad():
        _randomize_bn_stats(net, rng)
    sd = net.state_dict()

    params, stats = {}, {}
    for i, (side, names) in enumerate([
            ("a", ("ConvBNReLU_0", "ConvBNReLU_1", "ConvBNReLU_2")),
            ("b", ("ConvBNReLU_3", "ConvBNReLU_4", "ConvBNReLU_5"))]):
        for j, nm in enumerate(names):
            pre = "conv{}_{}".format(j + 1, side)
            p, s = _bn(sd, pre + ".bn")
            params[nm] = {"Conv_0": _conv(sd, pre + ".conv"),
                          "BatchNorm_0": p}
            stats[nm] = {"BatchNorm_0": s}

    def gated(dst_p, dst_s, pre):
        p, s = _bn(sd, pre + ".1")
        dst_p.update({"Conv_0": _conv(sd, pre + ".0"), "BatchNorm_0": p})
        dst_s["BatchNorm_0"] = s

    for mod in ("SAEM", "SEEM"):
        params[mod], stats[mod] = {}, {}
        for t in ("T1", "T2"):
            params[mod][t], stats[mod][t] = {}, {}
            gated(params[mod][t], stats[mod][t], "{}.{}".format(mod, t))
        params[mod]["dim_reduce"] = _t2j(
            sd["{}.dim_reduce.0.weight".format(mod)])[:, :, 0]
    params["fusion_conv"] = _conv(sd, "FusionLayer.0")
    p, s = _bn(sd, "FusionLayer.1")
    params["fusion_bn"], stats["fusion_bn"] = p, s
    params["fc"] = _lin(sd, "fc")

    x1 = rng.randn(B, bands, P, P).astype("float32")
    x2 = rng.randn(B, bands2, P, P).astype("float32")
    with torch.no_grad():
        t_out = net(torch.from_numpy(x1), torch.from_numpy(x2))

    ours = S2ENet(n_bands1=bands, n_bands2=bands2, n_classes=K, patch_size=P)
    j_out = ours.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x1.transpose(0, 2, 3, 1)),
                       jnp.asarray(x2.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(j_out), _t2j(t_out),
                               rtol=1e-3, atol=1e-3)
