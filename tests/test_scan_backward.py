"""Fused Pallas backward for the selective scan vs. the autodiff of the
associative-scan formulation (SURVEY.md §7 hard part #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cnn_tpu.ops.selective_scan import (_pallas_backward, selective_scan)


def _inputs(rng, b=5, L=12, d=8, n=4):
    u = jnp.asarray(rng.randn(b, L, d).astype("float32"))
    dt = jnp.asarray((np.abs(rng.randn(b, L, d)) * 0.1 + 0.01)
                     .astype("float32"))
    A = jnp.asarray(-np.abs(rng.randn(d, n)).astype("float32"))
    B = jnp.asarray(rng.randn(b, L, n).astype("float32"))
    C = jnp.asarray(rng.randn(b, L, n).astype("float32"))
    D = jnp.asarray(rng.randn(d).astype("float32"))
    return u, dt, A, B, C, D


@pytest.mark.parametrize("reverse", [False, True])
# (3, 33, 8, 4) spans many time chunks (Tc=4 -> 9, incl. a ragged final
# one) like the flagship's L=81 while staying affordable in interpret mode
@pytest.mark.parametrize("shape", [(5, 12, 8, 4), (3, 33, 8, 4)])
def test_backward_kernel_matches_autodiff(rng, reverse, shape):
    from jax.experimental.pallas import tpu as pltpu

    b, L, d, n = shape
    args = _inputs(rng, b, L, d, n)
    g = jnp.asarray(rng.randn(b, L, d).astype("float32"))

    _, vjp = jax.vjp(lambda *a: selective_scan(*a, reverse=reverse), *args)
    want = vjp(g)

    with pltpu.force_tpu_interpret_mode():
        got = _pallas_backward(*args, g, block_b=2, reverse=reverse)

    names = ["du", "ddt", "dA", "dB", "dC", "dD"]
    for nm, gv, wv in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                                   rtol=2e-3, atol=2e-4, err_msg=nm)


def test_backward_kernel_padding(rng):
    """Batch not divisible by block_b: padded rows must not pollute the
    accumulated dA/dD grads."""
    from jax.experimental.pallas import tpu as pltpu

    args = _inputs(rng, b=3, L=7, d=8, n=4)
    g = jnp.asarray(rng.randn(3, 7, 8).astype("float32"))
    _, vjp = jax.vjp(selective_scan, *args)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = _pallas_backward(*args, g, block_b=2)
    for gv, wv in zip(got, want):
        np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                                   rtol=2e-3, atol=2e-4)
