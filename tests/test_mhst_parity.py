"""MHST transplanted-weight parity vs the torch reference
(ref: model/compare_method/MHST/ — needs the mounted tree + stubs for
timm/torchsummary)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")
torch = pytest.importorskip("torch")


def _load_mhst():
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    layers.DropPath = DropPath
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules.setdefault("timm.models.layers", layers)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from model.compare_method.MHST.MHST import MHST as RefMHST

    return RefMHST


def _t2j(t):
    return np.asarray(t.detach().numpy())


def _lin(sd, p):
    out = {"kernel": _t2j(sd[p + ".weight"]).T}
    if p + ".bias" in sd:
        out["bias"] = _t2j(sd[p + ".bias"])
    return out


def _conv2(sd, p):
    out = {"kernel": _t2j(sd[p + ".weight"]).transpose(2, 3, 1, 0)}
    if p + ".bias" in sd:
        out["bias"] = _t2j(sd[p + ".bias"])
    return out


def _conv3(sd, p):
    out = {"kernel": _t2j(sd[p + ".weight"]).transpose(2, 3, 4, 1, 0)}
    if p + ".bias" in sd:
        out["bias"] = _t2j(sd[p + ".bias"])
    return out


def _bn(sd, p):
    return ({"bn": {"scale": _t2j(sd[p + ".weight"]),
                    "bias": _t2j(sd[p + ".bias"])}},
            {"bn": {"mean": _t2j(sd[p + ".running_mean"]),
                    "var": _t2j(sd[p + ".running_var"])}})


def _ln(sd, p):
    return {"scale": _t2j(sd[p + ".weight"]), "bias": _t2j(sd[p + ".bias"])}


def test_mhst_forward_parity():
    import jax.numpy as jnp

    from vit_cnn_tpu.models.mhst import MHST

    RefMHST = _load_mhst()
    rng = np.random.RandomState(8)
    bands, bands2, K, B, P = 16, 1, 5, 2, 8
    EN_DEPTH, HSP_DEPTH = 2, 2
    net = RefMHST(l1=bands, l2=bands2, patch_size=P, num_patches=P * P,
                  num_classes=K, encoder_embed_dim=64, en_depth=EN_DEPTH,
                  en_heads=4, mlp_dim=8, dropout=0.0, emb_dropout=0.0,
                  coefficient_hsi=0.6, coefficient_vit=0.7,
                  hsp_vit_depth=HSP_DEPTH, hsp_vit_num_heads=16,
                  head_tau=5.0, use_head_select=True).eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.copy_(torch.tensor(
                    rng.randn(m.num_features).astype("float32") * 0.2))
                m.running_var.copy_(torch.tensor(
                    1.0 + 0.3 * rng.rand(m.num_features).astype("float32")))
    sd = net.state_dict()

    params, stats = {}, {}

    # ---- HSI encoder
    hp, hs = {}, {}
    hp["conv1"] = _conv3(sd, "hsi_encoder.conv1")
    for i in range(4):
        hp["conv2_{}".format(i + 1)] = _conv3(
            sd, "hsi_encoder.conv2_{}".format(i + 1))
    hp["conv3"] = _conv3(sd, "hsi_encoder.conv3")
    hp["conv4"] = {"branch{}".format(i): _conv2(
        sd, "hsi_encoder.conv4.conv2_{}".format(i + 1)) for i in range(4)}
    hp["conv5"] = _conv2(sd, "hsi_encoder.conv5")
    for i in range(1, 6):
        hp["bn{}".format(i)], hs["bn{}".format(i)] = _bn(
            sd, "hsi_encoder.bn{}".format(i))
    params["hsi_encoder"], stats["hsi_encoder"] = hp, hs

    # ---- LiDAR encoder
    lp, ls = {}, {}
    for cn in ("conv1", "conv2"):
        lp[cn] = {"branch{}".format(i): _conv2(
            sd, "lidar_encoder.{}.conv2_{}".format(cn, i + 1))
            for i in range(4)}
    lp["conv3"] = _conv2(sd, "lidar_encoder.conv3")
    for i in range(1, 4):
        lp["bn{}".format(i)], ls["bn{}".format(i)] = _bn(
            sd, "lidar_encoder.bn{}".format(i))
    params["lidar_encoder"], stats["lidar_encoder"] = lp, ls

    # ---- top-level scalars / embeddings
    for k in ("weight_hsi", "weight_lidar", "vit_cls_coefficient",
              "cnn_cls_coefficient"):
        params[k] = _t2j(sd[k])
    params["encoder_embedding"] = _lin(sd, "encoder_embedding")
    params["cls_token"] = _t2j(sd["cls_token"])
    params["encoder_pos_embed"] = _t2j(sd["encoder_pos_embed"])
    params["head_norm"] = _ln(sd, "mlp_head.0")
    params["head"] = _lin(sd, "mlp_head.1")
    params["hsp_norm"] = _ln(sd, "HeadSelectViT.norm")

    # ---- vanilla encoder transformer (Residual(PreNorm(...)) layout)
    tr = {}
    for l in range(EN_DEPTH):
        pre = "en_transformer.layers.{}.".format(l)
        tr["attn_norm{}".format(l)] = _ln(sd, pre + "0.fn.norm")
        tr["attn{}".format(l)] = {
            "to_qkv": {"kernel": _t2j(sd[pre + "0.fn.fn.to_qkv.weight"]).T},
            "to_out": _lin(sd, pre + "0.fn.fn.to_out.0")}
        tr["ff_norm{}".format(l)] = _ln(sd, pre + "1.fn.norm")
        tr["ff{}".format(l)] = {
            "Dense_0": _lin(sd, pre + "1.fn.fn.mlp.0"),
            "Dense_1": _lin(sd, pre + "1.fn.fn.mlp.3")}
    params["en_transformer"] = tr

    # ---- head-select pool transformer blocks
    for i in range(HSP_DEPTH):
        pre = "HeadSelectViT.blocks.{}.".format(i)
        attn = {"query": _lin(sd, pre + "attn.query"),
                "key": _lin(sd, pre + "attn.key"),
                "value": _lin(sd, pre + "attn.value"),
                "proj": _lin(sd, pre + "attn.proj")}
        for pq in ("q", "k", "v"):
            attn["pool_" + pq] = {"kernel": _t2j(
                sd[pre + "attn.pool_{}.weight".format(pq)]
            ).transpose(2, 3, 1, 0)}
            attn["pool_{}_norm".format(pq)] = _ln(
                sd, pre + "attn.norm_{}".format(pq))
        params["hsp_block{}".format(i)] = {
            "norm1": _ln(sd, pre + "norm1"),
            "norm2": _ln(sd, pre + "norm2"),
            "attn": attn,
            "fc1": _lin(sd, pre + "mlp.fc1"),
            "fc2": _lin(sd, pre + "mlp.fc2"),
            "head_select": _lin(sd, pre + "head_select.mlp_head"),
        }

    # ---- PyConv CNN classifier
    params["cls_conv1"] = {"branch{}".format(i): _conv2(
        sd, "pyconv_classifier.conv1.conv2_{}".format(i + 1))
        for i in range(2)}
    params["cls_bn1"], stats["cls_bn1"] = _bn(sd, "pyconv_classifier.bn1")
    w = _t2j(sd["pyconv_classifier.conv2.0.weight"])[:, :, 0, 0]
    params["cls_conv2"] = {"kernel": w.T,
                           "bias": _t2j(sd["pyconv_classifier.conv2.0.bias"])}

    x1 = rng.randn(B, bands, P, P).astype("float32")
    x2 = rng.randn(B, bands2, P, P).astype("float32")
    with torch.no_grad():
        want = _t2j(net(torch.from_numpy(x1), torch.from_numpy(x2)))

    ours = MHST(n_bands1=bands, n_bands2=bands2, patch_size=P,
                num_patches=P * P, n_classes=K, encoder_embed_dim=64,
                en_depth=EN_DEPTH, en_heads=4, mlp_dim=8, dropout=0.0,
                emb_dropout=0.0, coefficient_hsi=0.6, coefficient_vit=0.7,
                hsp_vit_depth=HSP_DEPTH, hsp_vit_num_heads=16,
                head_tau=5.0, use_head_select=True,
                attnproj_mlp_drop=0.0, attn_drop=0.0)
    got = np.asarray(ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x1.transpose(0, 2, 3, 1)),
        jnp.asarray(x2.transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_pool_attention_eval_qkv_masks_redundant():
    """Serving-path optimization (round 5): at eval, _PoolAttention skips
    the q/k/v head-width masks because `out * width_select` zeroes the
    same lanes — every op in between is per-head-isolated. Pin EXACT
    equality between the module (masks skipped) and the literal old
    composition (masks applied at q/k/v), on a nontrivial mask."""
    import jax
    import jax.numpy as jnp

    from vit_cnn_tpu.models.mhst import _PoolAttention
    from vit_cnn_tpu.ops.attention import pooled_attention_reference

    B, N, H, HD, P = 3, 65, 16, 4, 8
    C = H * HD
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, C))
    # zero out heads 1, 5, 13 for sample 0; 0 and 15 for sample 2
    sel = np.ones((B, H), np.float32)
    sel[0, [1, 5, 13]] = 0.0
    sel[2, [0, 15]] = 0.0
    width = jnp.asarray(np.repeat(sel, HD, axis=-1))[:, None, :]

    att = _PoolAttention(C, H, (P, P), qkv_bias=True)
    v = att.init({"params": key, "dropout": key}, x[:2], train=False)
    got = att.apply(v, x, width, train=False)

    # literal old composition: masks applied at q/k/v AND at proj input
    p = v["params"]

    def dense(name, t):
        return t @ p[name]["kernel"] + p[name]["bias"]

    def pool(t, name):
        cls_tok, rest = t[:, :1], t[:, 1:]
        kern = jnp.tile(p[name]["kernel"], (1, 1, 1, H))
        r = jax.lax.conv_general_dilated(
            rest.reshape(B, P, P, C), kern.astype(t.dtype), (1, 1),
            [(1, 1), (1, 1)], feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        t2 = jnp.concatenate([cls_tok, r.reshape(B, P * P, C)], axis=1)
        ln = p[name + "_norm"]
        return t2, (ln["scale"], ln["bias"])

    q, lnq = pool(dense("query", x) * width, "pool_q")
    k, lnk = pool(dense("key", x) * width, "pool_k")
    vv, lnv = pool(dense("value", x) * width, "pool_v")
    o = pooled_attention_reference(q, k, vv, lnq, lnk, lnv, H, HD ** -0.5)
    o = o * width
    want = o @ p["proj"]["kernel"] + p["proj"]["bias"]

    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
