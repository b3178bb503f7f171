"""Selective state-space scan (Mamba-1 recurrence) for TPU.

The single hardest kernel in the build (SURVEY.md §7): the reference
delegates to HuggingFace ``MambaMixer``'s CUDA ``selective_scan_fn`` (or a
Python slow path) — ref: Mutimodality_Mamba7.py:16,326. Here:

* :func:`selective_scan` — ``jax.lax.associative_scan`` formulation of the
  linear recurrence  h_t = exp(dt_t A) h_{t-1} + (dt_t B_t) u_t,
  y_t = C_t . h_t + D u_t. Differentiable, fully parallel over the token
  axis (log2(L) steps), XLA-fused.
* :func:`selective_scan_pallas` — a Pallas TPU kernel doing the sequential
  scan in VMEM with a (block, state, channel) register layout, wrapped in a
  ``jax.custom_vjp`` whose backward runs the associative-scan formulation.
  For the tiny sequences here (49/81 tokens) the sequential kernel avoids
  the O(L) temporary blowup of the associative scan at large batch.

Shapes (d = intermediate channels, n = state size):
  u, dt: (batch, L, d);  A: (d, n);  B, C: (batch, L, n);  D: (d,)
  -> y: (batch, L, d)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Associative-scan formulation (reference implementation + backward path)
# ---------------------------------------------------------------------------

def selective_scan(u, dt, A, B, C, D, reverse: bool = False):
    """Parallel selective scan via first-order linear recurrence.
    ``reverse=True`` scans the token axis back-to-front (the reverse
    directional paths; equivalent to flipping inputs and outputs)."""
    dA = jnp.exp(dt[..., None] * A[None, None])            # (b, L, d, n)
    dBu = (dt * u)[..., None] * B[:, :, None, :]           # (b, L, d, n)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, b_l * a_r + b_r

    _, h = jax.lax.associative_scan(combine, (dA, dBu), axis=1,
                                    reverse=reverse)
    y = jnp.einsum("bldn,bln->bld", h, C)
    return y + D * u


# ---------------------------------------------------------------------------
# Pallas sequential kernel
# ---------------------------------------------------------------------------

def _scan_kernel(u_ref, dt_ref, At_ref, b_ref, c_ref, d_ref, y_ref,
                 time_chunk: int = 16, reverse: bool = False):
    """One grid cell scans `bb` sequences.

    Performance shape (this kernel was 2/3 of flagship inference before
    tuning): the transcendental exp() and all input-dependent products are
    hoisted out of the sequential loop and computed as one vectorized op
    per time chunk; the recurrence itself is two fused multiply-adds per
    step on a register-resident (bb, n, d) state (fori_loop carry, no VMEM
    scratch round-trip). Time is processed in chunks so the precomputed
    (bb, Tc, n, d) tensors stay within scoped VMEM.
    """
    bb, L, d = u_ref.shape
    n = b_ref.shape[-1]
    # accumulate in f32 even under a bf16 compute policy; only the y store
    # drops back to the input dtype
    At = At_ref[...].astype(jnp.float32)   # (n, d): A.T for the (n, d) layout
    Dv = d_ref[...].astype(jnp.float32)    # (1, d)

    h0 = jnp.zeros((bb, n, d), jnp.float32)
    n_chunks = (L + time_chunk - 1) // time_chunk
    chunk_order = range(n_chunks - 1, -1, -1) if reverse else range(n_chunks)

    h = h0
    for c in chunk_order:                          # static unroll over chunks
        t0 = c * time_chunk
        tc = min(time_chunk, L - t0)
        dt_c = dt_ref[:, t0:t0 + tc, :].astype(jnp.float32)   # (bb, Tc, d)
        u_c = u_ref[:, t0:t0 + tc, :].astype(jnp.float32)
        B_c = b_ref[:, t0:t0 + tc, :].astype(jnp.float32)     # (bb, Tc, n)
        C_c = c_ref[:, t0:t0 + tc, :].astype(jnp.float32)
        # vectorized across the whole chunk: one exp, one product tree
        dA_c = jnp.exp(dt_c[:, :, None, :] * At[None, None])  # (bb, Tc, n, d)
        dBu_c = (dt_c * u_c)[:, :, None, :] * B_c[..., None]
        du_c = Dv * u_c                                       # (bb, Tc, d)

        # sequential part is ONLY the 2-op state update; everything else
        # (the C-projection reduce and the y store) batches over the chunk
        hs = [None] * tc
        steps = range(tc - 1, -1, -1) if reverse else range(tc)
        for t in steps:                            # static unroll in-chunk
            h = dA_c[:, t] * h + dBu_c[:, t]
            hs[t] = h
        H_c = jnp.stack(hs, axis=1)                # (bb, Tc, n, d)
        y_c = jnp.sum(C_c[..., None] * H_c, axis=2) + du_c
        y_ref[:, t0:t0 + tc, :] = y_c.astype(y_ref.dtype)


def _pallas_forward(u, dt, A, B, C, D, block_b: int, reverse: bool = False):
    # Sequence inputs stream into the kernel in their own dtype (bf16 under
    # the mixed-precision policy — half the HBM traffic); the kernel widens
    # each chunk to f32 on load, because bf16 state feedback diverges over
    # L steps. A/D are tiny and always f32.
    A = A.astype(jnp.float32)
    D = D.astype(jnp.float32)
    b, L, d = u.shape
    n = A.shape[-1]
    pad = (-b) % block_b
    if pad:
        z = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        u, dt, B, C = z(u), z(dt), z(B), z(C)
    bt = u.shape[0]

    grid = (bt // block_b,)
    seq_spec = lambda ch: pl.BlockSpec((block_b, L, ch),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        partial(_scan_kernel, reverse=reverse),
        grid=grid,
        in_specs=[
            seq_spec(d), seq_spec(d),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            seq_spec(n), seq_spec(n),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=seq_spec(d),
        out_shape=jax.ShapeDtypeStruct((bt, L, d), u.dtype),
    )(u, dt, A.T, B, C, D[None])
    return y[:b]


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def selective_scan_pallas(u, dt, A, B, C, D, block_b: int = 8,
                          reverse: bool = False):
    return _pallas_forward(u, dt, A, B, C, D, block_b, reverse)


def _fwd(u, dt, A, B, C, D, block_b, reverse):
    return (_pallas_forward(u, dt, A, B, C, D, block_b, reverse),
            (u, dt, A, B, C, D))


def _bwd(block_b, reverse, res, g):
    u, dt, A, B, C, D = res
    _, vjp = jax.vjp(partial(selective_scan, reverse=reverse),
                     u, dt, A, B, C, D)
    return vjp(g)


selective_scan_pallas.defvjp(_fwd, _bwd)


def selective_scan_auto(u, dt, A, B, C, D, use_pallas: bool = True,
                        block_b: int = 8, reverse: bool = False):
    """Pallas kernel on TPU, associative scan elsewhere (CPU tests)."""
    if use_pallas and jax.default_backend() == "tpu":
        return selective_scan_pallas(u, dt, A, B, C, D, block_b, reverse)
    return selective_scan(u, dt, A, B, C, D, reverse=reverse)
