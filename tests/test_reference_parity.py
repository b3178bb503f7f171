"""Numerics parity vs the ACTUAL reference (SURVEY.md §4 "numerics parity
tests"): load the reference's torch modules from /root/reference, transplant
their weights into our flax models, and compare forward outputs on the same
inputs. Skipped when the reference tree is not mounted."""

import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

torch = pytest.importorskip("torch")


def _load_ref(relpath, name):
    import sys
    import types

    # stub dependencies the reference imports but never uses at runtime
    for stub in ("torchsummary", "torchvision"):
        if stub not in sys.modules:
            mod = types.ModuleType(stub)
            mod.summary = lambda *a, **k: None
            sys.modules[stub] = mod
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _t2j(t):
    return np.asarray(t.detach().numpy())


def _lin(sd, prefix):
    """torch Linear -> flax Dense {kernel, bias}."""
    return {"kernel": _t2j(sd[prefix + ".weight"]).T,
            "bias": _t2j(sd[prefix + ".bias"])}


def _conv(sd, prefix):
    """torch Conv2d (O,I,kh,kw) -> flax Conv (kh,kw,I,O)."""
    return {"kernel": _t2j(sd[prefix + ".weight"]).transpose(2, 3, 1, 0),
            "bias": _t2j(sd[prefix + ".bias"])}


def _bn(sd, prefix):
    return ({"bn": {"scale": _t2j(sd[prefix + ".weight"]),
                    "bias": _t2j(sd[prefix + ".bias"])}},
            {"bn": {"mean": _t2j(sd[prefix + ".running_mean"]),
                    "var": _t2j(sd[prefix + ".running_var"])}})


def _randomize_bn_stats(net, rng):
    """Non-default running stats so the eval-mode comparison is strong."""
    for m in net.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(torch.tensor(
                rng.randn(m.num_features).astype("float32") * 0.2))
            m.running_var.copy_(torch.tensor(
                1.0 + 0.3 * rng.rand(m.num_features).astype("float32")))


def test_endnet_forward_parity():
    import jax.numpy as jnp

    from vit_cnn_tpu.models.endnet import EndNet

    ref = _load_ref("model/compare_method/EndNet.py", "ref_endnet")
    rng = np.random.RandomState(0)
    bands, bands2, K, B = 20, 1, 6, 8
    net = ref.EndNet(bands, bands2, K).eval()
    with torch.no_grad():
        _randomize_bn_stats(net, rng)
    sd = net.state_dict()

    params, stats = {}, {}
    for side, pre in (("encoder_a", "a"), ("encoder_b", "b")):
        params[side], stats[side] = {}, {}
        for i in range(4):
            params[side]["Dense_{}".format(i)] = _lin(
                sd, "encoder_fc{}_{}".format(i + 1, pre))
            p, s = _bn(sd, "encoder_bn{}_{}".format(i + 1, pre))
            params[side]["BatchNorm_{}".format(i)] = p
            stats[side]["BatchNorm_{}".format(i)] = s
    params["joint_fc5"] = _lin(sd, "joint_encoder_fc5")
    params["joint_bn5"], stats["joint_bn5"] = _bn(sd, "joint_encoder_bn5")
    params["joint_fc6"] = _lin(sd, "joint_encoder_fc6")
    params["joint_bn6"], stats["joint_bn6"] = _bn(sd, "joint_encoder_bn6")
    params["head"] = _lin(sd, "joint_encoder_fc7")
    for side, pre in (("decoder_a", "a"), ("decoder_b", "b")):
        params[side] = {"Dense_{}".format(i): _lin(
            sd, "decoder_fc{}_{}".format(i + 1, pre)) for i in range(4)}

    x1 = rng.randn(B, bands).astype("float32")
    x2 = rng.randn(B, bands2).astype("float32")
    with torch.no_grad():
        t_out = net(torch.from_numpy(x1), torch.from_numpy(x2))

    ours = EndNet(n_bands1=bands, n_bands2=bands2, n_classes=K)
    j_out = ours.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x1)[:, None, None, :],
                       jnp.asarray(x2)[:, None, None, :], train=False)
    # logits + both reconstructions must match the reference bitwise-ish
    for got, want in zip(j_out[:3], t_out[:3]):
        np.testing.assert_allclose(np.asarray(got), _t2j(want),
                                   rtol=1e-4, atol=1e-5)


def test_early_fusion_cnn_forward_parity():
    import jax.numpy as jnp

    from vit_cnn_tpu.models.mdl_hong import Early_fusion_CNN

    ref = _load_ref("model/compare_method/DML_Hong.py", "ref_dml")
    rng = np.random.RandomState(1)
    bands, bands2, K, B, P = 10, 1, 5, 4, 7
    net = ref.Early_fusion_CNN(bands, bands2, K).eval()
    with torch.no_grad():
        _randomize_bn_stats(net, rng)
    sd = net.state_dict()

    def cbr(conv_name, bn_name):
        p, s = _bn(sd, bn_name)
        return ({"Conv_0": _conv(sd, conv_name), "BatchNorm_0": p},
                {"BatchNorm_0": s})

    stem_p, stem_s = {}, {}
    for i in range(4):
        p, s = cbr("conv{}".format(i + 1), "bn{}".format(i + 1))
        stem_p["ConvBNReLU_{}".format(i)] = p
        stem_s["ConvBNReLU_{}".format(i)] = s
    head_p, head_s = {}, {}
    for i, idx in enumerate((5, 6)):
        p, s = cbr("conv{}".format(idx), "bn{}".format(idx))
        head_p["ConvBNReLU_{}".format(i)] = p
        head_s["ConvBNReLU_{}".format(i)] = s
    w7 = _t2j(sd["conv7.weight"])[:, :, 0, 0]        # (K, 64)
    head_p["Dense_0"] = {"kernel": w7.T, "bias": _t2j(sd["conv7.bias"])}

    params = {"_Stem_0": stem_p, "_JointHead_0": head_p}
    stats = {"_Stem_0": stem_s, "_JointHead_0": head_s}

    x1 = rng.randn(B, bands, P, P).astype("float32")
    x2 = rng.randn(B, bands2, P, P).astype("float32")
    with torch.no_grad():
        t_out = net(torch.from_numpy(x1), torch.from_numpy(x2))

    ours = Early_fusion_CNN(n_bands1=bands, n_bands2=bands2, n_classes=K)
    j_out = ours.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x1.transpose(0, 2, 3, 1)),
                       jnp.asarray(x2.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(j_out), _t2j(t_out),
                               rtol=1e-4, atol=1e-4)


def test_middle_and_late_fusion_parity():
    """The remaining two MDL-Hong variants (ref: DML_Hong.py:65-224)."""
    import jax.numpy as jnp

    from vit_cnn_tpu.models.mdl_hong import (Late_fusion_CNN,
                                             Middle_fusion_CNN)

    ref = _load_ref("model/compare_method/DML_Hong.py", "ref_dml3")
    rng = np.random.RandomState(7)
    bands, bands2, K, B, P = 9, 2, 5, 4, 7

    def cbr(sd, conv_name, bn_name):
        p, s = _bn(sd, bn_name)
        return ({"Conv_0": _conv(sd, conv_name), "BatchNorm_0": p},
                {"BatchNorm_0": s})

    def stem(sd, suffix):
        sp, ss = {}, {}
        for i in range(4):
            p, s = cbr(sd, "conv{}_{}".format(i + 1, suffix),
                       "bn{}_{}".format(i + 1, suffix))
            sp["ConvBNReLU_{}".format(i)] = p
            ss["ConvBNReLU_{}".format(i)] = s
        return sp, ss

    x1 = rng.randn(B, bands, P, P).astype("float32")
    x2 = rng.randn(B, bands2, P, P).astype("float32")
    j1 = jnp.asarray(x1.transpose(0, 2, 3, 1))
    j2 = jnp.asarray(x2.transpose(0, 2, 3, 1))

    # ---- Middle fusion: two stems -> concat -> joint head
    net = ref.Middle_fusion_CNN(bands, bands2, K).eval()
    with torch.no_grad():
        _randomize_bn_stats(net, rng)
    sd = net.state_dict()
    params, stats = {}, {}
    params["stem_a"], stats["stem_a"] = stem(sd, "a")
    params["stem_b"], stats["stem_b"] = stem(sd, "b")
    head_p, head_s = {}, {}
    for i, idx in enumerate((5, 6)):
        p, s = cbr(sd, "conv{}".format(idx), "bn{}".format(idx))
        head_p["ConvBNReLU_{}".format(i)] = p
        head_s["ConvBNReLU_{}".format(i)] = s
    w7 = _t2j(sd["conv7.weight"])[:, :, 0, 0]
    head_p["Dense_0"] = {"kernel": w7.T, "bias": _t2j(sd["conv7.bias"])}
    params["_JointHead_0"], stats["_JointHead_0"] = head_p, head_s
    with torch.no_grad():
        want = net(torch.from_numpy(x1), torch.from_numpy(x2))
    got = Middle_fusion_CNN(n_bands1=bands, n_bands2=bands2, n_classes=K
                            ).apply({"params": params, "batch_stats": stats},
                                    j1, j2, train=False)
    np.testing.assert_allclose(np.asarray(got), _t2j(want), rtol=1e-4,
                               atol=1e-4)

    # ---- Late fusion: two full towers -> logit-level concat head
    net = ref.Late_fusion_CNN(bands, bands2, K).eval()
    with torch.no_grad():
        _randomize_bn_stats(net, rng)
    sd = net.state_dict()
    params, stats = {}, {}
    for suf in ("a", "b"):
        params["stem_" + suf], stats["stem_" + suf] = stem(sd, suf)
        for i, idx in enumerate((5, 6)):
            p, s = cbr(sd, "conv{}_{}".format(idx, suf),
                       "bn{}_{}".format(idx, suf))
            params["c{}_{}".format(idx, suf)] = p
            stats["c{}_{}".format(idx, suf)] = s
    w7 = _t2j(sd["conv7.weight"])[:, :, 0, 0]
    params["Dense_0"] = {"kernel": w7.T, "bias": _t2j(sd["conv7.bias"])}
    with torch.no_grad():
        want = net(torch.from_numpy(x1), torch.from_numpy(x2))
    got = Late_fusion_CNN(n_bands1=bands, n_bands2=bands2, n_classes=K
                          ).apply({"params": params, "batch_stats": stats},
                                  j1, j2, train=False)
    np.testing.assert_allclose(np.asarray(got), _t2j(want), rtol=1e-4,
                               atol=1e-4)


def test_cross_fusion_cnn_forward_parity():
    """The weight-SHARED cross-modal variant with 3 logit sets
    (ref: DML_Hong.py:226-323)."""
    import jax.numpy as jnp

    from vit_cnn_tpu.models.mdl_hong import Cross_fusion_CNN

    ref = _load_ref("model/compare_method/DML_Hong.py", "ref_dml2")
    rng = np.random.RandomState(2)
    bands, bands2, K, B, P = 8, 2, 5, 4, 7
    net = ref.Cross_fusion_CNN(bands, bands2, K).eval()
    with torch.no_grad():
        _randomize_bn_stats(net, rng)
    sd = net.state_dict()

    def cbr(conv_name, bn_name):
        p, s = _bn(sd, bn_name)
        return ({"Conv_0": _conv(sd, conv_name), "BatchNorm_0": p},
                {"BatchNorm_0": s})

    params, stats = {}, {}
    for side in ("a", "b"):
        sp, ss = {}, {}
        for i in range(3):
            p, s = cbr("conv{}_{}".format(i + 1, side),
                       "bn{}_{}".format(i + 1, side))
            sp["ConvBNReLU_{}".format(i)] = p
            ss["ConvBNReLU_{}".format(i)] = s
        params["stem_" + side] = sp
        stats["stem_" + side] = ss
        p, s = cbr("conv4_" + side, "bn4_" + side)
        params["conv4_" + side] = p
        stats["conv4_" + side] = s
    head_p, head_s = {}, {}
    for i, idx in enumerate((5, 6)):
        p, s = cbr("conv{}".format(idx), "bn{}".format(idx))
        head_p["ConvBNReLU_{}".format(i)] = p
        head_s["ConvBNReLU_{}".format(i)] = s
    w7 = _t2j(sd["conv7.weight"])[:, :, 0, 0]
    head_p["Dense_0"] = {"kernel": w7.T, "bias": _t2j(sd["conv7.bias"])}
    params["joint_head"] = head_p
    stats["joint_head"] = head_s

    x1 = rng.randn(B, bands, P, P).astype("float32")
    x2 = rng.randn(B, bands2, P, P).astype("float32")
    with torch.no_grad():
        t_out = net(torch.from_numpy(x1), torch.from_numpy(x2))

    ours = Cross_fusion_CNN(n_bands1=bands, n_bands2=bands2, n_classes=K)
    j_out = ours.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x1.transpose(0, 2, 3, 1)),
                       jnp.asarray(x2.transpose(0, 2, 3, 1)), train=False)
    for got, want in zip(j_out, t_out):
        np.testing.assert_allclose(np.asarray(got), _t2j(want),
                                   rtol=1e-4, atol=1e-4)


def test_fusatnet_forward_parity():
    """Dual-attention towers + valid-conv classifier
    (ref: FusAtNet.py:10-186)."""
    import jax.numpy as jnp

    from vit_cnn_tpu.models.fusatnet import FusAtNet

    ref = _load_ref("model/compare_method/FusAtNet.py", "ref_fusat")
    rng = np.random.RandomState(3)
    bands, bands2, K, B, P = 6, 1, 4, 2, 11
    net = ref.FusAtNet(bands, bands2, K).eval()
    with torch.no_grad():
        _randomize_bn_stats(net, rng)
    sd = net.state_dict()

    def cbr(prefix):
        p, s = _bn(sd, prefix + ".bn")
        return ({"Conv_0": _conv(sd, prefix + ".conv"), "BatchNorm_0": p},
                {"BatchNorm_0": s})

    def cbr2(prefix, idx):      # Residual_Unit conv1/bn1 or conv2/bn2
        p, s = _bn(sd, "{}.bn{}".format(prefix, idx))
        return ({"Conv_0": _conv(sd, "{}.conv{}".format(prefix, idx)),
                 "BatchNorm_0": p}, {"BatchNorm_0": s})

    params, stats = {}, {}

    def put(path, pair):
        node_p, node_s = params, stats
        for k in path[:-1]:
            node_p = node_p.setdefault(k, {})
            node_s = node_s.setdefault(k, {})
        node_p[path[-1]], node_s[path[-1]] = pair

    # feature towers: 6 ConvUnits each
    for tower, tname in (("hfe", "hfe"), ("mfe", "mfe")):
        for i in range(6):
            put((tname, "ConvBNReLU_{}".format(i)),
                cbr("{}.conv{}".format(tower, i + 1)))
    # attention towers: 2 residual units + 2 ConvUnits
    for tower, tname in (("spatial_am", "spatial_am"), ("mam", "mam")):
        for r in range(2):
            for c in range(2):
                put((tname, "_ResUnit_{}".format(r),
                     "ConvBNReLU_{}".format(c)),
                    cbr2("{}.res{}".format(tower, r + 1), c + 1))
        for i in range(2):
            put((tname, "ConvBNReLU_{}".format(i)),
                cbr("{}.conv{}".format(tower, i + 1)))
    # spectral attention (anonymous at FusAtNet level)
    for r in range(2):
        for c in range(2):
            put(("_ResUnitPooled_{}".format(r), "ConvBNReLU_{}".format(c)),
                cbr2("spectral_am.res{}".format(r + 1), c + 1))
    put(("ConvBNReLU_0",), cbr("spectral_am.conv1"))
    put(("ConvBNReLU_1",), cbr("spectral_am.conv2"))
    # classifier: 5 valid ConvUnits + final 1x1
    for i in range(5):
        put(("ConvBNReLU_{}".format(i + 2),), cbr("cm.conv{}".format(i + 1)))
    params["Conv_0"] = _conv(sd, "cm.conv6")

    x1 = rng.randn(B, bands, P, P).astype("float32")
    x2 = rng.randn(B, bands2, P, P).astype("float32")
    with torch.no_grad():
        t_out = net(torch.from_numpy(x1), torch.from_numpy(x2))

    ours = FusAtNet(n_bands1=bands, n_bands2=bands2, n_classes=K)
    j_out = ours.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x1.transpose(0, 2, 3, 1)),
                       jnp.asarray(x2.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(j_out), _t2j(t_out),
                               rtol=2e-3, atol=2e-3)


def test_mft_forward_parity():
    """Transformer path: Conv3d stem, grouped HetConv, learned tokenization,
    MCrossAttention blocks (ref: MFT.py:131-214)."""
    import jax.numpy as jnp

    from vit_cnn_tpu.models.mft import MFT

    ref = _load_ref("model/compare_method/MFT.py", "ref_mft")
    rng = np.random.RandomState(4)
    bands, bands2, K, B, P, FM = 16, 1, 5, 3, 11, 16
    net = ref.MFT(P, FM, bands, bands2, K, False).eval()
    with torch.no_grad():
        _randomize_bn_stats(net, rng)
    sd = net.state_dict()

    def bn3(prefix):
        p, s = _bn(sd, prefix)
        return p, s

    params, stats = {}, {}
    # conv5: torch Conv3d (8, 1, 9, 3, 3) -> flax (9, 3, 3, 1, 8)
    params["conv5"] = {
        "kernel": _t2j(sd["conv5.0.weight"]).transpose(2, 3, 4, 1, 0),
        "bias": _t2j(sd["conv5.0.bias"])}
    params["bn5"], stats["bn5"] = bn3("conv5.1")
    params["conv6"] = {"gwc": _conv(sd, "conv6.0.gwc"),
                       "pwc": _conv(sd, "conv6.0.pwc")}
    params["bn6"], stats["bn6"] = bn3("conv6.1")
    params["lidar_conv"] = _conv(sd, "lidarConv.0")
    params["lidar_bn"], stats["lidar_bn"] = bn3("lidarConv.1")

    params["token_wA"] = _t2j(sd["token_wA"])[0]
    params["token_wV"] = _t2j(sd["token_wV"])[0]
    params["token_wA_L"] = _t2j(sd["token_wA_L"])[0]
    params["token_wV_L"] = _t2j(sd["token_wV_L"])[0]
    params["position_embeddings"] = _t2j(sd["position_embeddings"])
    params["out3"] = _lin(sd, "out3")
    params["encoder_norm"] = {
        "scale": _t2j(sd["ca.encoder_norm.weight"]),
        "bias": _t2j(sd["ca.encoder_norm.bias"])}
    for i in range(2):
        pre = "ca.layer.{}.".format(i)
        params["block{}".format(i)] = {
            "LayerNorm_0": {"scale": _t2j(sd[pre + "attention_norm.weight"]),
                            "bias": _t2j(sd[pre + "attention_norm.bias"])},
            "LayerNorm_1": {"scale": _t2j(sd[pre + "ffn_norm.weight"]),
                            "bias": _t2j(sd[pre + "ffn_norm.bias"])},
            "_MCrossAttention_0": {
                "wq": {"kernel": _t2j(sd[pre + "attn.wq.weight"]).T},
                "wk": {"kernel": _t2j(sd[pre + "attn.wk.weight"]).T},
                "wv": {"kernel": _t2j(sd[pre + "attn.wv.weight"]).T},
                "proj": _lin(sd, pre + "attn.proj")},
            "_Mlp_0": {"Dense_0": _lin(sd, pre + "ffn.fc1"),
                       "Dense_1": _lin(sd, pre + "ffn.fc2")},
        }

    x1 = rng.randn(B, bands, P, P).astype("float32")
    x2 = rng.randn(B, bands2, P, P).astype("float32")
    with torch.no_grad():
        t_out = net(torch.from_numpy(x1), torch.from_numpy(x2))

    ours = MFT(patch_size=P, fm=FM, n_bands1=bands, n_bands2=bands2,
               n_classes=K)
    j_out = ours.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x1.transpose(0, 2, 3, 1)),
                       jnp.asarray(x2.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(j_out), _t2j(t_out),
                               rtol=1e-3, atol=1e-3)


def test_hctnet_forward_parity():
    """Dual-stem + shared tokenization + cross-token fusion encoder
    (ref: HCTnet.py:224-367). The reference's conv2d_features declares
    in_channels=8 where its own 3D stem produces 8*(bands-2) — unrunnable
    as shipped (QUIRKS.md #2); the test re-sizes that conv the way the
    in-tree comment indicates, then transplants."""
    import jax.numpy as jnp

    from vit_cnn_tpu.models.hctnet import HCTnet

    ref = _load_ref("model/compare_method/HCTnet.py", "ref_hct")
    rng = np.random.RandomState(6)
    bands, bands2, K, B, P = 10, 1, 5, 3, 11
    net = ref.HCTnet(in_channels=bands2, num_classes=K).eval()
    with torch.no_grad():
        # repair the stem bug exactly as the working value in the
        # reference's comment indicates (8 * (bands - 2) input channels)
        net.conv2d_features[0] = torch.nn.Conv2d(8 * (bands - 2), 64, (3, 3))
        net = net.eval()
        _randomize_bn_stats(net, rng)
    sd = net.state_dict()

    def bnp(prefix):
        return _bn(sd, prefix)

    params, stats = {}, {}
    params["conv3d"] = {
        "kernel": _t2j(sd["conv3d_features.0.weight"]).transpose(2, 3, 4, 1, 0),
        "bias": _t2j(sd["conv3d_features.0.bias"])}
    params["bn3d"], stats["bn3d"] = bnp("conv3d_features.1")
    params["conv2d"] = _conv(sd, "conv2d_features.0")
    params["bn2d"], stats["bn2d"] = bnp("conv2d_features.1")
    params["conv2d_l"] = _conv(sd, "conv2d_features2.0")
    params["bn2d_l"], stats["bn2d_l"] = bnp("conv2d_features2.1")
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

    x1 = rng.randn(B, bands, P, P).astype("float32")
    x2 = rng.randn(B, bands2, P, P).astype("float32")
    with torch.no_grad():
        t_out = net(torch.from_numpy(x1), torch.from_numpy(x2))

    ours = HCTnet(n_bands1=bands, n_bands2=bands2, n_classes=K)
    j_out = ours.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x1.transpose(0, 2, 3, 1)),
                       jnp.asarray(x2.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(j_out), _t2j(t_out),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("mode", ["ViT", "CAF"])
def test_spectralformer_forward_parity(mode):
    """Band-token ViT incl. the CAF cross-layer skipcat conv
    (ref: spectralformer.py:78-156)."""
    import jax.numpy as jnp

    from vit_cnn_tpu.models.spectralformer import SpectralFormer

    ref = _load_ref("model/compare_method/spectralformer.py", "ref_sf")
    rng = np.random.RandomState(5)
    bands, bands2, K, B = 16, 1, 5, 4
    N = bands + bands2
    dim, depth, heads, dim_head, mlp = 32, 5, 4, 16, 8
    net = ref.SpectralFormer(
        image_size=1, near_band=1, num_patches=N, num_classes=K, dim=dim,
        depth=depth, heads=heads, mlp_dim=mlp, dim_head=dim_head,
        dropout=0.0, emb_dropout=0.0, mode=mode).eval()
    sd = net.state_dict()

    params = {
        "patch_to_embedding": _lin(sd, "patch_to_embedding"),
        "pos_embedding": _t2j(sd["pos_embedding"]),
        "cls_token": _t2j(sd["cls_token"]),
        "head_norm": {"scale": _t2j(sd["mlp_head.0.weight"]),
                      "bias": _t2j(sd["mlp_head.0.bias"])},
        "head": _lin(sd, "mlp_head.1"),
    }
    tr = {}
    for l in range(depth):
        pre = "transformer.layers.{}.".format(l)
        tr["attn_norm{}".format(l)] = {
            "scale": _t2j(sd[pre + "0.fn.norm.weight"]),
            "bias": _t2j(sd[pre + "0.fn.norm.bias"])}
        tr["attn{}".format(l)] = {
            "to_qkv": {"kernel": _t2j(sd[pre + "0.fn.fn.to_qkv.weight"]).T},
            "to_out": _lin(sd, pre + "0.fn.fn.to_out.0")}
        tr["ff_norm{}".format(l)] = {
            "scale": _t2j(sd[pre + "1.fn.norm.weight"]),
            "bias": _t2j(sd[pre + "1.fn.norm.bias"])}
        tr["ff{}".format(l)] = {
            "Dense_0": _lin(sd, pre + "1.fn.fn.net.0"),
            "Dense_1": _lin(sd, pre + "1.fn.fn.net.3")}
    if mode == "CAF":
        for i in range(depth - 2):
            w = _t2j(sd["transformer.skipcat.{}.weight".format(i)])
            tr["skipcat{}".format(i)] = w.reshape(w.shape[0], -1)
            tr["skipcat{}_bias".format(i)] = _t2j(
                sd["transformer.skipcat.{}.bias".format(i)])
    params["transformer"] = tr

    x1 = rng.randn(B, bands).astype("float32")
    x2 = rng.randn(B, bands2).astype("float32")
    with torch.no_grad():
        t_out = net(torch.from_numpy(x1), torch.from_numpy(x2))

    ours = SpectralFormer(num_patches=N, n_classes=K, dim=dim, depth=depth,
                          heads=heads, dim_head=dim_head, mlp_dim=mlp,
                          dropout=0.0, emb_dropout=0.0, mode=mode)
    j_out = ours.apply({"params": params},
                       jnp.asarray(x1)[:, None, None, :],
                       jnp.asarray(x2)[:, None, None, :], train=False)
    np.testing.assert_allclose(np.asarray(j_out), _t2j(t_out),
                               rtol=1e-3, atol=1e-3)
