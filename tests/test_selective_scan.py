"""Selective-scan kernel tests: associative-scan formulation vs a naive
sequential reference, gradients, and the Pallas kernel in interpret mode
(SURVEY.md §7 hard part #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cnn_tpu.ops.selective_scan import (selective_scan,
                                            selective_scan_pallas)


def naive_scan(u, dt, A, B, C, D):
    """Literal sequential recurrence (the HF slow-path semantics)."""
    u, dt, A, B, C, D = map(np.asarray, (u, dt, A, B, C, D))
    b, L, d = u.shape
    n = A.shape[-1]
    y = np.zeros_like(u)
    for bi in range(b):
        h = np.zeros((d, n))
        for t in range(L):
            dA = np.exp(dt[bi, t][:, None] * A)              # (d, n)
            dBu = (dt[bi, t] * u[bi, t])[:, None] * B[bi, t][None]
            h = dA * h + dBu
            y[bi, t] = h @ C[bi, t] + D * u[bi, t]
    return y


def _inputs(rng, b=3, L=12, d=8, n=4):
    u = rng.randn(b, L, d).astype(np.float32)
    dt = np.abs(rng.randn(b, L, d)).astype(np.float32) * 0.1 + 0.01
    A = -np.abs(rng.randn(d, n)).astype(np.float32)
    B = rng.randn(b, L, n).astype(np.float32)
    C = rng.randn(b, L, n).astype(np.float32)
    D = rng.randn(d).astype(np.float32)
    return u, dt, A, B, C, D


def test_associative_scan_matches_naive(rng):
    args = _inputs(rng)
    got = np.asarray(selective_scan(*map(jnp.asarray, args)))
    np.testing.assert_allclose(got, naive_scan(*args), rtol=2e-4, atol=2e-5)


def test_scan_is_differentiable(rng):
    args = tuple(map(jnp.asarray, _inputs(rng)))

    def loss(u, dt, A, B, C, D):
        return jnp.sum(selective_scan(u, dt, A, B, C, D) ** 2)

    grads = jax.grad(loss, argnums=(0, 2))(*args)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


def test_pallas_kernel_interpret_matches(rng):
    """Pallas kernel correctness via the interpreter (no TPU needed)."""
    from jax.experimental.pallas import tpu as pltpu

    args = tuple(map(jnp.asarray, _inputs(rng, b=5, L=9, d=8, n=4)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(selective_scan_pallas(*args, 2))
    np.testing.assert_allclose(got, naive_scan(*args), rtol=2e-4, atol=2e-5)


def test_scan_long_sequence_stability(rng):
    # decaying A keeps the recurrence stable over longer sequences
    args = _inputs(rng, b=2, L=81, d=16, n=16)
    got = np.asarray(selective_scan(*map(jnp.asarray, args)))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, naive_scan(*args), rtol=2e-3, atol=2e-4)
