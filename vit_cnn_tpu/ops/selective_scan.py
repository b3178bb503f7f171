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

def selective_scan(u, dt, A, B, C, D):
    """Parallel selective scan via first-order linear recurrence."""
    dA = jnp.exp(dt[..., None] * A[None, None])            # (b, L, d, n)
    dBu = (dt * u)[..., None] * B[:, :, None, :]           # (b, L, d, n)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, b_l * a_r + b_r

    _, h = jax.lax.associative_scan(combine, (dA, dBu), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, C)
    return y + D * u


# ---------------------------------------------------------------------------
# Pallas sequential kernel
# ---------------------------------------------------------------------------

def _scan_kernel(u_ref, dt_ref, At_ref, b_ref, c_ref, d_ref, y_ref, h_ref):
    """One grid cell scans `bb` sequences. Layout: state h is (bb, n, d) so
    elementwise ops tile as (bb*n sublanes, d lanes)."""
    bb, L, d = u_ref.shape
    n = b_ref.shape[-1]
    h_ref[...] = jnp.zeros_like(h_ref)
    # accumulate in f32 even under a bf16 compute policy; only the y store
    # drops back to the input dtype
    At = At_ref[...].astype(jnp.float32)   # (n, d): A.T for the (n, d) layout
    Dv = d_ref[...].astype(jnp.float32)    # (1, d)

    def body(t, _):
        dt_t = dt_ref[:, t, :].astype(jnp.float32)           # (bb, d)
        u_t = u_ref[:, t, :].astype(jnp.float32)
        B_t = b_ref[:, t, :].astype(jnp.float32)             # (bb, n)
        C_t = c_ref[:, t, :].astype(jnp.float32)
        dA = jnp.exp(dt_t[:, None, :] * At[None])            # (bb, n, d)
        h = dA * h_ref[...] + (dt_t * u_t)[:, None, :] * B_t[..., None]
        h_ref[...] = h
        y_t = jnp.sum(C_t[..., None] * h, axis=1) + Dv * u_t
        y_ref[:, t, :] = y_t.astype(y_ref.dtype)
        return 0

    jax.lax.fori_loop(0, L, body, 0)


def _pallas_forward(u, dt, A, B, C, D, block_b: int):
    # The recurrence is accumulated in f32 regardless of the compute policy
    # (bf16 state feedback diverges over L steps), and Mosaic's bf16 layouts
    # reject the narrow (d=72/128) slices this kernel loads — so the kernel
    # runs wholly in f32; only the output returns to the caller's dtype.
    out_dtype = u.dtype
    u, dt, A, B, C, D = (x.astype(jnp.float32) for x in (u, dt, A, B, C, D))
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
        _scan_kernel,
        grid=grid,
        in_specs=[
            seq_spec(d), seq_spec(d),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            seq_spec(n), seq_spec(n),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=seq_spec(d),
        out_shape=jax.ShapeDtypeStruct((bt, L, d), u.dtype),
        scratch_shapes=[pltpu.VMEM((block_b, n, d), jnp.float32)],
    )(u, dt, A.T, B, C, D[None])
    return y[:b].astype(out_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def selective_scan_pallas(u, dt, A, B, C, D, block_b: int = 8):
    return _pallas_forward(u, dt, A, B, C, D, block_b)


def _fwd(u, dt, A, B, C, D, block_b):
    return _pallas_forward(u, dt, A, B, C, D, block_b), (u, dt, A, B, C, D)


def _bwd(block_b, res, g):
    u, dt, A, B, C, D = res
    _, vjp = jax.vjp(selective_scan, u, dt, A, B, C, D)
    return vjp(g)


selective_scan_pallas.defvjp(_fwd, _bwd)


def selective_scan_auto(u, dt, A, B, C, D, use_pallas: bool = True,
                        block_b: int = 8):
    """Pallas kernel on TPU, associative scan elsewhere (CPU tests)."""
    if use_pallas and jax.default_backend() == "tpu":
        return selective_scan_pallas(u, dt, A, B, C, D, block_b)
    return selective_scan(u, dt, A, B, C, D)
