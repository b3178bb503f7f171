"""The full hsiMamba path_type / cls_token / pos-embed capability surface
(ref: Mutimodality_Mamba7.py:444-1032). Every path_type string the
reference's forward accepts must construct and run; gate semantics must
match the reference's literal per-path branches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cnn_tpu.nn.mamba import (DirectionalMambaBackbone, MambaMixer,
                                  MultiDirMambaLayer,
                                  sincos_2d_position_embedding)
from vit_cnn_tpu.ops.scan_paths import (inverse_permutation, path_orderings,
                                        path_spec)

HIDDEN, INTER = 16, 8


def _run_layer(path_type, L, b=2, seed=0):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (b, L, HIDDEN))
    layer = MultiDirMambaLayer(HIDDEN, INTER, path_type=path_type,
                               use_pallas=False)
    variables = layer.init({"params": key, "shuffle": key}, x)
    out = layer.apply(variables, x, rngs={"shuffle": key})
    return x, variables, out


ALL_LAYER_PATHS = [
    ("forward", 49), ("shuffle", 49), ("eight_directions_gate", 49),
    ("9twoclock", 9), ("25twoclock", 25), ("49twoclock", 49),
    ("81twoclock", 81), ("49_2+8", 49), ("81_2+8", 81),
    ("forward_reverse_mean", 49), ("forward_reverse_gate", 49),
    ("forward_reverse_shuffle_gate", 49),
    ("forward_reverse_shuffle_mean", 49),
]


@pytest.mark.parametrize("path_type,L", ALL_LAYER_PATHS)
def test_every_path_type_runs(path_type, L):
    x, _, out = _run_layer(path_type, L)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def _literal_streams(params, x, orders, n_shuffle, shuffle_key):
    """The reference's widened-batch formulation: gather every ordering,
    one shared mixer, inverse gathers; returns restored streams."""
    b, L, _ = x.shape
    perms = list(orders)
    if n_shuffle:
        perms.append(np.asarray(jax.random.permutation(shuffle_key, L)))
    mixer = MambaMixer(HIDDEN, INTER, use_pallas=False)
    mixer_params = {k: v for k, v in params.items()
                    if k not in ("direction_gate", "gate")}
    streams = []
    for p in perms:
        mixed = mixer.apply({"params": mixer_params}, x[:, p])
        streams.append(mixed[:, inverse_permutation(np.asarray(p))])
    return streams


def _randomize(params, key):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [p + 0.3 * jax.random.normal(k, p.shape)
                  for p, k in zip(leaves, keys)])


@pytest.mark.parametrize("path_type,L", ALL_LAYER_PATHS)
def test_matches_literal_formulation(path_type, L):
    """Optimized layer == literal widened-batch formulation with the exact
    per-path gate semantics of the reference branch."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, L, HIDDEN))
    layer = MultiDirMambaLayer(HIDDEN, INTER, path_type=path_type,
                               use_pallas=False)
    variables = layer.init({"params": key, "shuffle": key}, x)
    params = _randomize(variables["params"], jax.random.PRNGKey(7))
    got = layer.apply({"params": params}, x, rngs={"shuffle": key})

    spec = path_spec(path_type)
    orders = path_orderings(path_type, L)
    # the shuffle stream's permutation key must match the layer's draw
    sk = layer.apply({"params": params}, method=layer._shuffle_key,
                     rngs={"shuffle": key})
    streams = _literal_streams(params, x, orders, spec.n_shuffle, sk)
    n_dir = len(streams)

    if spec.combine == "softmax10":
        w = jax.nn.softmax(params["direction_gate"])[:n_dir]
        want = sum(w[i] * streams[i] for i in range(n_dir))
    elif spec.combine == "raw10":
        w = params["direction_gate"][:n_dir]
        want = sum(w[i] * streams[i] for i in range(n_dir))
    elif spec.combine == "mean":
        want = sum(streams) / n_dir
    elif spec.combine == "dynamic":
        means = [s.mean(axis=1) for s in streams]          # (B, hidden)
        gate_in = jnp.concatenate(means, axis=-1)
        dyn = jax.nn.softmax(gate_in @ params["gate"]["kernel"])
        want = sum(dyn[:, i, None, None] * streams[i] for i in range(n_dir))
    else:                                                   # none
        want = sum(streams)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)


def test_shuffle_stream_uses_rng():
    """Different shuffle keys -> different outputs (torch.randperm parity:
    a fresh permutation every call, ref: :445)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 49, HIDDEN))
    layer = MultiDirMambaLayer(HIDDEN, INTER, path_type="shuffle",
                               use_pallas=False)
    variables = layer.init({"params": key, "shuffle": key}, x)
    params = _randomize(variables["params"], jax.random.PRNGKey(5))
    o1 = layer.apply({"params": params}, x,
                     rngs={"shuffle": jax.random.PRNGKey(1)})
    o2 = layer.apply({"params": params}, x,
                     rngs={"shuffle": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_gate_parameter_is_ten_slots():
    """self.weights upstream is ALWAYS (1, 10, 1); twoclock softmaxes over
    all ten and uses two -> 0.1 weights at init (ref: :360, :607)."""
    _, variables, _ = _run_layer("49twoclock", 49)
    assert variables["params"]["direction_gate"].shape == (10,)


def test_twoclock_init_gate_is_one_tenth():
    """At zeros-init the two spiral streams each get softmax weight 1/10,
    NOT 1/2 — the dead 8 slots still normalize (ref: :607)."""
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 9, HIDDEN))
    layer = MultiDirMambaLayer(HIDDEN, INTER, path_type="9twoclock",
                               use_pallas=False)
    variables = layer.init({"params": key}, x)
    params = variables["params"]
    got = layer.apply({"params": params}, x)
    streams = _literal_streams(params, x, path_orderings("9twoclock", 9),
                               0, None)
    want = 0.1 * (streams[0] + streams[1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)


def test_eight_directions_zero_init_is_zero():
    """eight_directions_gate applies NO softmax to the zeros-init weights
    (ref: :514-515) -> the mixed stream is exactly zero at init."""
    _, variables, out = _run_layer("eight_directions_gate", 49)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


# ---------------------------------------------------------------------------
# Backbone surface: multi_clock_gate identity, cls tokens, pos embeds
# ---------------------------------------------------------------------------

def _backbone(paths=None, **kw):
    defaults = dict(embed_dims=16, num_layers=2, feedforward_channels=8,
                    img_size=7, in_channels=4, path_type="forward",
                    use_pallas=False)
    defaults.update(kw)
    return DirectionalMambaBackbone(**defaults)


def test_multi_clock_gate_is_identity_doubling():
    """The CLI's dead default path matches no branch: each layer is
    x = residual + x, with the final LN still applied (ref: :987-989)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 7, 7, 4))
    bb = _backbone(path_type="multi_clock_gate", out_type="raw")
    variables = bb.init({"params": key}, x)
    # no mixer parameters are created for the dead path
    assert not any(k.startswith("mixer") for k in variables["params"])
    out = bb.apply(variables, x)
    # reproduce by hand: embed + pos, x4 (two doubling layers), final LN
    p = variables["params"]
    emb = jnp.einsum("bhwc,cd->bhwd", x, p["patch_embed"]["kernel"][0, 0])
    tokens = emb.reshape(2, 49, 16) + p["pos_embed"]
    t4 = tokens * 4
    mu = t4.mean(-1, keepdims=True)
    var = ((t4 - mu) ** 2).mean(-1, keepdims=True)
    want = ((t4 - mu) / jnp.sqrt(var + 1e-6)) * p["ln1"]["scale"] \
        + p["ln1"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("cls_position,n_extra", [
    ("head", 1), ("tail", 1), ("middle", 1), ("head_tail", 2)])
def test_cls_positions_run(cls_position, n_extra):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 7, 7, 4))
    for out_type, want_shape in [("cls_token", (2, 16)),
                                 ("featmap", (2, 7, 7, 16)),
                                 ("avg_featmap", (2, 16)),
                                 ("raw", (2, 49 + n_extra, 16))]:
        bb = _backbone(cls_position=cls_position, out_type=out_type)
        variables = bb.init({"params": key}, x)
        assert variables["params"]["cls_token"].shape == (1, n_extra, 16)
        out = bb.apply(variables, x)
        assert out.shape == want_shape, (cls_position, out_type)


def test_cls_token_head_reads_first_token():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 7, 7, 4))
    raw = _backbone(cls_position="head", out_type="raw")
    tok = _backbone(cls_position="head", out_type="cls_token")
    variables = raw.init({"params": key}, x)
    np.testing.assert_allclose(
        np.asarray(tok.apply(variables, x)),
        np.asarray(raw.apply(variables, x)[:, 0]), rtol=1e-6)


def test_sine_pos_embed_matches_reference_formula():
    """Replicates mmpretrain build_2d_sincos_position_embedding verbatim
    (ref: position_encoding.py:123-173), including the torch meshgrid
    'ij' indexing over (w, h)."""
    torch = pytest.importorskip("torch")
    h, w, e, temp = 5, 7, 16, 10000.0
    grid_w = torch.arange(w, dtype=torch.float32)
    grid_h = torch.arange(h, dtype=torch.float32)
    grid_w, grid_h = torch.meshgrid(grid_w, grid_h, indexing="ij")
    pos_dim = e // 4
    omega = torch.arange(pos_dim, dtype=torch.float32) / pos_dim
    omega = 1.0 / (temp ** omega)
    out_w = torch.einsum("m,d->md", grid_w.flatten(), omega)
    out_h = torch.einsum("m,d->md", grid_h.flatten(), omega)
    want = torch.cat([torch.sin(out_w), torch.cos(out_w),
                      torch.sin(out_h), torch.cos(out_h)], dim=1)[None]
    got = sincos_2d_position_embedding(h, w, e, temp)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-6, atol=1e-6)


def test_sine_backbone_has_no_pos_param():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 4))
    bb = _backbone(pe_type="sine", img_size=8, out_type="raw")
    variables = bb.init({"params": key}, x)
    assert "pos_embed" not in variables["params"]
    out = bb.apply(variables, x)
    assert np.isfinite(np.asarray(out)).all()
