"""MultiDirMambaLayer must be numerically identical to the literal
formulation (gather every ordering -> shared MambaMixer on the widened
batch -> inverse gathers -> softmax direction gate), which mirrors
ref: Mutimodality_Mamba7.py:608-701. The optimized layer hoists the
permutation-commuting ops and serves reverse orderings via reverse scans —
pure restructuring, same function."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_cnn_tpu.nn.mamba import MambaMixer, MultiDirMambaLayer
from vit_cnn_tpu.ops.scan_paths import (base_paths, inverse_permutation,
                                        path_orderings)


def literal_multidir(layer_params, x, hidden, inter, path_type):
    """The reference's widened-batch formulation, using the SAME params."""
    b, L, _ = x.shape
    orders = path_orderings(path_type, L)
    n_dir = len(orders)
    perms = jnp.asarray(np.stack(orders))
    inv_perms = jnp.asarray(np.stack([inverse_permutation(o)
                                      for o in orders]))

    mixer = MambaMixer(hidden, inter, use_pallas=False)
    mixer_params = {k: v for k, v in layer_params.items()
                    if k != "direction_gate"}

    gathered = x[:, perms].transpose(1, 0, 2, 3).reshape(n_dir * b, L, -1)
    mixed = mixer.apply({"params": mixer_params}, gathered)
    mixed = mixed.reshape(n_dir, b, L, -1)
    unmixed = jnp.take_along_axis(mixed, inv_perms[:, None, :, None], axis=2)
    w = jax.nn.softmax(layer_params["direction_gate"])
    return jnp.einsum("dblc,d->blc", unmixed, w)


def test_matches_literal_formulation():
    hidden, inter = 24, 12
    L = 9                                   # 3x3 grid, '9_2+8' -> 10 dirs
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, L, hidden))

    layer = MultiDirMambaLayer(hidden, inter, path_type="9_2+8",
                               use_pallas=False)
    variables = layer.init({"params": key}, x)
    got = layer.apply(variables, x)
    want = literal_multidir(variables["params"], x, hidden, inter, "9_2+8")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_nonzero_gate_matches_literal():
    """Same check with a non-uniform direction gate (random params)."""
    hidden, inter = 16, 8
    L = 9
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, L, hidden))
    layer = MultiDirMambaLayer(hidden, inter, path_type="9_2+8",
                               use_pallas=False)
    variables = layer.init({"params": key}, x)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.3 * jax.random.normal(key, p.shape),
        variables["params"])
    got = layer.apply({"params": params}, x)
    want = literal_multidir(params, x, hidden, inter, "9_2+8")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)


def test_base_paths_structure():
    orders, bases, fwd, rev = base_paths("81_2+8", 81)
    assert len(orders) == 10
    assert len(bases) == 6                  # 4 fwd/rev pairs + 2 spirals
    assert sum(1 for r in rev if r >= 0) == 4
    # every direction is served exactly once
    served = sorted(fwd + [r for r in rev if r >= 0])
    assert served == list(range(10))


def test_reverse_scan_equals_flipped_forward():
    from vit_cnn_tpu.ops.selective_scan import selective_scan

    key = jax.random.PRNGKey(2)
    b, L, d, n = 2, 7, 4, 3
    u = jax.random.normal(key, (b, L, d))
    dt = jax.nn.softplus(jax.random.normal(key, (b, L, d))) * 0.1
    A = -jnp.abs(jax.random.normal(key, (d, n)))
    B = jax.random.normal(key, (b, L, n))
    C = jax.random.normal(key, (b, L, n))
    D = jnp.ones((d,))
    got = selective_scan(u, dt, A, B, C, D, reverse=True)
    flip = lambda t: jnp.flip(t, axis=1)
    want = flip(selective_scan(flip(u), flip(dt), A, flip(B), flip(C), D))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_bf16_onehot_permute_matches_gather():
    """In bf16, permute_tokens/unpermute_sum run as one-hot MXU matmuls —
    each output element is selected by a single unit coefficient, so they
    must be BIT-EXACT against the gather formulation."""
    from vit_cnn_tpu.nn.mamba import permute_tokens, unpermute_sum
    from vit_cnn_tpu.ops.scan_paths import (inverse_permutation,
                                            path_orderings)

    key = jax.random.PRNGKey(3)
    B, L, C = 4, 81, 8
    orders = path_orderings("81_2+8", L)
    perms = jnp.asarray(np.stack(orders))
    inv = jnp.asarray(np.stack([inverse_permutation(o) for o in orders]))
    x = jax.random.normal(key, (B, L, C)).astype(jnp.bfloat16)

    got = jax.jit(permute_tokens)(x, perms)
    want = x[:, perms].transpose(1, 0, 2, 3)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))

    comb = jax.random.normal(key, (len(orders), B, L, C)).astype(jnp.bfloat16)
    got2 = jax.jit(unpermute_sum)(comb, inv)
    want2 = jnp.sum(jnp.take_along_axis(
        comb.astype(jnp.float32), inv[:, None, :, None], axis=2), axis=0)
    np.testing.assert_allclose(np.asarray(got2, np.float32),
                               np.asarray(want2), rtol=2e-2, atol=1e-2)


def test_lane_major_path_matches_generic(monkeypatch):
    """The round-3 lane-major pipeline (permute emits (L, ch, batch),
    WCN conv, in-layout projections, lane_major_io scan, fused inverse-
    permute einsum) must match the generic batch-major path. Exercised on
    CPU via VCT_LANE_MAJOR=force (the scan falls back to the associative
    form with edge transposes; the surrounding einsum/conv restructuring
    is exactly what runs on TPU)."""
    from vit_cnn_tpu.nn.precision import cast_floating

    hidden, inter = 24, 12
    L = 9
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (4, L, hidden))

    layer = MultiDirMambaLayer(hidden, inter, path_type="9_2+8",
                               use_pallas=True)
    variables = layer.init({"params": key}, x)
    vb = {"params": cast_floating(variables["params"], jnp.bfloat16)}
    xb = x.astype(jnp.bfloat16)

    monkeypatch.setenv("VCT_LANE_MAJOR", "0")
    want = np.asarray(layer.apply(vb, xb), np.float32)
    monkeypatch.setenv("VCT_LANE_MAJOR", "force")
    got = np.asarray(layer.apply(vb, xb), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    # and against the f32 generic path, at bf16 tolerance
    monkeypatch.delenv("VCT_LANE_MAJOR")
    ref = np.asarray(layer.apply(variables, x), np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-1, atol=1e-1)


def test_lane_major_gradients_match_generic(monkeypatch):
    """The fused directional kernels are custom_vjp with reference-formula
    backwards; gradients through the lane path must match the generic
    path (bf16 tolerance)."""
    from vit_cnn_tpu.nn.precision import cast_floating

    hidden, inter = 24, 12
    L = 9
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (4, L, hidden))
    layer = MultiDirMambaLayer(hidden, inter, path_type="9_2+8",
                               use_pallas=True)
    variables = layer.init({"params": key}, x)
    vb = cast_floating(variables["params"], jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)

    def loss(params, xx):
        return jnp.sum(layer.apply({"params": params}, xx)
                       .astype(jnp.float32) ** 2)

    monkeypatch.setenv("VCT_LANE_MAJOR", "0")
    g_ref = jax.grad(loss)(vb, xb)
    monkeypatch.setenv("VCT_LANE_MAJOR", "force")
    g_lane = jax.grad(loss)(vb, xb)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_l, _ = jax.tree_util.tree_flatten_with_path(g_lane)
    for (path, r), (_, l) in zip(flat_r, flat_l):
        r = np.asarray(r, np.float32)
        l = np.asarray(l, np.float32)
        scale = max(np.max(np.abs(r)), 1e-3)
        np.testing.assert_allclose(
            l / scale, r / scale, rtol=0, atol=6e-2,
            err_msg=f"gradient diverged on lane path: {path}")
