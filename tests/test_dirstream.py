"""Fused directional-stream kernels (ops/dirstream.py): forward and the
round-3 fused ADJOINT kernels vs jax.vjp of the reference formulation,
via the Pallas TPU interpreter."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from vit_cnn_tpu.ops.dirstream import (_dir_conv_adjoint, _inv_sum_adjoint,
                                       dir_conv_silu_reference,
                                       inv_perm_weighted_sum_reference)

L, D, B, K = 9, 8, 6, 4
ORDERS = (tuple(range(L)),
          tuple(reversed(range(L))),
          tuple((i * 4) % L for i in range(L)),   # a bijection for gcd(4,9)=1
          tuple((i * 7) % L for i in range(L)))
REV_ROWS = (1, 3)
INV_ORDERS = tuple(tuple(int(np.argsort(np.asarray(o))[t]) for t in range(L))
                   for o in ORDERS)


def _data(key):
    ks = jax.random.split(key, 3)
    u = jax.random.normal(ks[0], (L, D, B))
    cw = jax.random.normal(ks[1], (K, D)) * 0.5
    cb = jax.random.normal(ks[2], (D,)) * 0.1
    return u, cw, cb


def test_dir_conv_adjoint_matches_vjp_interpret():
    u, cw, cb = _data(jax.random.PRNGKey(0))
    kg = jax.random.split(jax.random.PRNGKey(1), 2)
    out, vjp = jax.vjp(
        lambda u, w, b: dir_conv_silu_reference(u, w, b, ORDERS, REV_ROWS),
        u, cw, cb)
    gf = jax.random.normal(kg[0], out[0].shape)
    gr = jax.random.normal(kg[1], out[1].shape)
    want = vjp((gf, gr))
    with pltpu.force_tpu_interpret_mode():
        got = _dir_conv_adjoint(u, cw, cb, gf, gr, ORDERS, REV_ROWS,
                                block_b=2)   # forces the padding path too
    for w, g, name in zip(want, got, ("du", "dcw", "dcb")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_dir_conv_adjoint_no_reverse_rows_interpret():
    u, cw, cb = _data(jax.random.PRNGKey(2))
    out, vjp = jax.vjp(
        lambda u, w, b: dir_conv_silu_reference(u, w, b, ORDERS[:2], ()),
        u, cw, cb)
    gf = jax.random.normal(jax.random.PRNGKey(3), out[0].shape)
    gr = jnp.zeros(out[1].shape)
    want = vjp((gf, gr))
    with pltpu.force_tpu_interpret_mode():
        got = _dir_conv_adjoint(u, cw, cb, gf, gr, ORDERS[:2], (),
                                block_b=3)
    for w, g, name in zip(want, got, ("du", "dcw", "dcb")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_inv_sum_adjoint_matches_vjp_interpret():
    ks = jax.random.split(jax.random.PRNGKey(4), 5)
    yf = jax.random.normal(ks[0], (len(ORDERS), L, D, B))
    yr = jax.random.normal(ks[1], (len(REV_ROWS), L, D, B))
    wf = jax.random.normal(ks[2], (len(ORDERS),))
    wr = jax.random.normal(ks[3], (len(REV_ROWS),))
    out, vjp = jax.vjp(
        lambda yf, yr, wf, wr: inv_perm_weighted_sum_reference(
            yf, yr, INV_ORDERS, REV_ROWS, wf, wr),
        yf, yr, wf, wr)
    g = jax.random.normal(ks[4], out.shape)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = _inv_sum_adjoint(yf, yr, wf, wr, g, INV_ORDERS, REV_ROWS,
                               block_b=2)
    for w, gg, name in zip(want, got, ("dyf", "dyr", "dwf", "dwr")):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(w),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_layer_gradients_through_fused_adjoints(monkeypatch):
    """End-to-end: MultiDirMambaLayer gradients with the FUSED adjoint
    kernels (VCT_DIRSTREAM_FUSED_BWD=force + lane-major force, under the
    Pallas interpreter) must match the generic batch-major path — the
    same contract test_lane_major_gradients_match_generic pins for the
    XLA-recompute backward."""
    from vit_cnn_tpu.nn.mamba import MultiDirMambaLayer
    from vit_cnn_tpu.nn.precision import cast_floating

    hidden, inter = 24, 12
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (4, 9, hidden))
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
    monkeypatch.setenv("VCT_DIRSTREAM_FUSED_BWD", "force")
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss)(vb, xb)
    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_fused)[0]
    for (path, r), (_, f) in zip(flat_r, flat_f):
        r = np.asarray(r, np.float32)
        f = np.asarray(f, np.float32)
        scale = max(np.max(np.abs(r)), 1e-3)
        np.testing.assert_allclose(
            f / scale, r / scale, rtol=0, atol=6e-2,
            err_msg=f"fused-adjoint gradient diverged: {path}")


def test_inv_sum_adjoint_no_reverse_interpret():
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    yf = jax.random.normal(ks[0], (3, L, D, B))
    yr = jnp.zeros((0, L, D, B))
    wf = jax.random.normal(ks[1], (3,))
    wr = jnp.zeros((0,))
    out, vjp = jax.vjp(
        lambda yf, yr, wf, wr: inv_perm_weighted_sum_reference(
            yf, yr, INV_ORDERS[:3], (), wf, wr),
        yf, yr, wf, wr)
    g = jax.random.normal(ks[2], out.shape)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = _inv_sum_adjoint(yf, yr, wf, wr, g, INV_ORDERS[:3], (),
                               block_b=2)
    for w, gg, name in zip(want, got, ("dyf", "dyr", "dwf", "dwr")):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(w),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
