"""Selective state-space scan (Mamba-1 recurrence) for TPU.

The single hardest kernel in the build (SURVEY.md §7): the reference
delegates to HuggingFace ``MambaMixer``'s CUDA ``selective_scan_fn`` (or a
Python slow path) — ref: Mutimodality_Mamba7.py:16,326. Here:

* :func:`selective_scan` — ``jax.lax.associative_scan`` formulation of the
  linear recurrence  h_t = exp(dt_t A) h_{t-1} + (dt_t B_t) u_t,
  y_t = C_t . h_t + D u_t. Differentiable, fully parallel over the token
  axis (log2(L) steps), XLA-fused.
* :func:`selective_scan_pallas` — a Pallas TPU kernel doing the sequential
  scan in VMEM with a LANE-MAJOR (seq, channel, batch-on-lanes) layout
  (see perf/ROOFLINE.md for the measured layout comparison), wrapped in a
  ``jax.custom_vjp`` with a fused Pallas backward. For the tiny sequences
  here (49/81 tokens) the sequential kernel avoids the O(L) temporary
  blowup of the associative scan at large batch (14.2 GB per temporary at
  the widened flagship chunk — it OOMs HBM outright).

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
                 time_chunk: int = 8, reverse: bool = False,
                 squeeze_lead: bool = False):
    """One grid cell scans `bb` sequences in a LANE-MAJOR layout.

    Performance shape (measured in perf/scan_sweep.py, see perf/ROOFLINE.md):
    blocks are (L, d, bb) / (L, n, bb) with **bb = 128 sequences on the
    128-lane axis** and d on sublanes (72 = 9x8 and 128 = 16x8 tile
    exactly), so every elementwise op runs at full VPU width — 3.9x faster
    than the round-1 (bb=8, Tc, n, d) layout, which wasted lanes (d=72 ->
    56%) and scattered work over 16x more grid cells. The transcendental
    exp() and all input-dependent products are hoisted out of the
    sequential loop and vectorized per time chunk; the recurrence itself is
    one fused multiply-add per step on the (n, d, bb) state. Accumulation
    is f32 even when inputs stream in bf16 (bf16 state feedback diverges
    over L steps).
    """
    # squeeze_lead: blocks are (1, L, ch, bb) — one directional stream of a
    # 4D (n_streams, L, ch, batch) array per grid cell (see the lane-major
    # fused-direction pipeline in nn/mamba.py)
    L, d, bb = u_ref.shape[-3:]
    n = b_ref.shape[-2]
    rd = ((lambda ref, a, b: ref[0, a:b]) if squeeze_lead
          else (lambda ref, a, b: ref[a:b]))
    At = At_ref[...].astype(jnp.float32)   # (n, d): A.T for the (n, d) layout
    Dv = d_ref[...].astype(jnp.float32)    # (1, d)

    h = jnp.zeros((n, d, bb), jnp.float32)
    n_chunks = (L + time_chunk - 1) // time_chunk
    chunk_order = range(n_chunks - 1, -1, -1) if reverse else range(n_chunks)

    for c in chunk_order:                          # static unroll over chunks
        t0 = c * time_chunk
        tc = min(time_chunk, L - t0)
        dt_c = rd(dt_ref, t0, t0 + tc).astype(jnp.float32)    # (Tc, d, bb)
        u_c = rd(u_ref, t0, t0 + tc).astype(jnp.float32)
        B_c = rd(b_ref, t0, t0 + tc).astype(jnp.float32)      # (Tc, n, bb)
        C_c = rd(c_ref, t0, t0 + tc).astype(jnp.float32)
        # vectorized across the whole chunk: one exp, one product tree
        dA_c = jnp.exp(dt_c[:, None] * At[None, :, :, None])  # (Tc, n, d, bb)
        dBu_c = (dt_c * u_c)[:, None] * B_c[:, :, None, :]

        # sequential part is ONLY the 1-FMA state update; everything else
        # (the C-projection reduce and the y store) batches over the chunk
        hs = [None] * tc
        steps = range(tc - 1, -1, -1) if reverse else range(tc)
        for t in steps:                            # static unroll in-chunk
            h = dA_c[t] * h + dBu_c[t]
            hs[t] = h
        H_c = jnp.stack(hs, axis=0)                # (Tc, n, d, bb)
        y_c = jnp.sum(C_c[:, :, None, :] * H_c, axis=1) \
            + Dv[..., None] * u_c
        if squeeze_lead:
            y_ref[0, t0:t0 + tc] = y_c.astype(y_ref.dtype)
        else:
            y_ref[t0:t0 + tc] = y_c.astype(y_ref.dtype)


def _pallas_forward(u, dt, A, B, C, D, block_b: int, reverse: bool = False,
                    lane_major_io: bool = False):
    # Sequence inputs stream into the kernel in their own dtype (bf16 under
    # the mixed-precision policy — half the HBM traffic); the kernel widens
    # each chunk to f32 on load. A/D are tiny and always f32. The (b, L, ch)
    # -> (L, ch, b) transposes in/out are plain XLA copies; with
    # ``lane_major_io`` the caller supplies/consumes (L, ch, b) arrays
    # directly and they disappear entirely (the round-3 mixer pipeline
    # computes its conv/projections in that layout; perf/ROOFLINE.md).
    A = A.astype(jnp.float32)
    D = D.astype(jnp.float32)
    if lane_major_io and u.ndim == 4:
        # (n_streams, L, ch, batch): one directional stream per grid row,
        # batch blocks per grid column — no transposes, no stream folding
        ns, L, d, b = u.shape
        n = A.shape[-1]
        pad = (-b) % block_b
        if pad:
            z = lambda x: jnp.concatenate(
                [x, jnp.zeros(x.shape[:3] + (pad,), x.dtype)], axis=3)
            u, dt, B, C = z(u), z(dt), z(B), z(C)
        bt = u.shape[3]
        seq_spec = lambda ch: pl.BlockSpec(
            (1, L, ch, block_b), lambda s, i: (s, 0, 0, i),
            memory_space=pltpu.VMEM)
        y = pl.pallas_call(
            partial(_scan_kernel, reverse=reverse, squeeze_lead=True),
            grid=(ns, bt // block_b),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            in_specs=[
                seq_spec(d), seq_spec(d),
                pl.BlockSpec((n, d), lambda s, i: (0, 0),
                             memory_space=pltpu.VMEM),
                seq_spec(n), seq_spec(n),
                pl.BlockSpec((1, d), lambda s, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=seq_spec(d),
            out_shape=jax.ShapeDtypeStruct((ns, L, d, bt), u.dtype),
        )(u, dt, A.T, B, C, D[None])
        return y[..., :b]
    if lane_major_io:
        L, d, b = u.shape
        pad = (-b) % block_b
        if pad:
            z = lambda x: jnp.concatenate(
                [x, jnp.zeros(x.shape[:2] + (pad,), x.dtype)], axis=2)
            u, dt, B, C = z(u), z(dt), z(B), z(C)
        bt = u.shape[2]
    else:
        b, L, d = u.shape
        pad = (-b) % block_b
        if pad:
            z = lambda x: jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
            u, dt, B, C = z(u), z(dt), z(B), z(C)
        bt = u.shape[0]
        tp = lambda x: jnp.transpose(x, (1, 2, 0))
        u, dt, B, C = tp(u), tp(dt), tp(B), tp(C)
    n = A.shape[-1]

    grid = (bt // block_b,)
    seq_spec = lambda ch: pl.BlockSpec((L, ch, block_b),
                                       lambda i: (0, 0, i),
                                       memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        partial(_scan_kernel, reverse=reverse),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            seq_spec(d), seq_spec(d),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            seq_spec(n), seq_spec(n),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=seq_spec(d),
        out_shape=jax.ShapeDtypeStruct((L, d, bt), u.dtype),
    )(u, dt, A.T, B, C, D[None])
    if lane_major_io:
        return y[:, :, :b]
    return jnp.transpose(y, (2, 0, 1))[:b]


# ---------------------------------------------------------------------------
# Fused Pallas backward (SURVEY.md §7 hard part #1: "fused fwd/bwd")
#
# The adjoint of the recurrence has the same shape as the recurrence itself,
# run in reverse:  λ_t = C_t ⊗ g_t + dA_{t+1} ⊙ λ_{t+1}  with
# ∂dA_t = λ_t ⊙ h_{t-1},  ∂dBu_t = λ_t.  Nothing is saved from the forward
# pass but the raw inputs (flash-style): the kernel recomputes h per time
# chunk from boundary states captured in a cheap first sweep. The
# associative-scan VJP this replaces materializes O(L) copies of the
# (batch, L, d, n) state in HBM and was ~10x slower than the forward.
# ---------------------------------------------------------------------------

def _scan_bwd_kernel(u_ref, dt_ref, At_ref, b_ref, c_ref, d_ref, g_ref,
                     du_ref, ddt_ref, db_ref, dc_ref, dA_ref, dD_ref,
                     time_chunk: int = 4, reverse: bool = False,
                     squeeze_lead: bool = False):
    """Lane-major adjoint kernel: same (L, ch, bb) layout as the forward
    (batch on the 128-lane axis), state/adjoint carried as (n, d, bb).

    time_chunk is 4 (not the forward's 8): the adjoint holds ~5 live
    (Tc, n, d, bb) f32 temporaries across its two sweeps and Mosaic does
    not reuse scoped buffers across the statically-unrolled chunk
    iterations — Tc=8 overflows VMEM (204M of 128M) at the flagship's
    widened train shapes, Tc=4 fits and times identically to Tc=2
    (perf/bwd_sweep.py, 2026-08-16: stage1 9.8 ms, stage2 8.0 ms)."""
    L, d, bb = u_ref.shape[-3:]
    n = b_ref.shape[-2]
    At = At_ref[...].astype(jnp.float32)            # (n, d)
    Dv = d_ref[...].astype(jnp.float32)             # (1, d)

    first = pl.program_id(0) == 0
    if squeeze_lead:
        first = first & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dA_ref[...] = jnp.zeros_like(dA_ref)
        dD_ref[...] = jnp.zeros_like(dD_ref)

    n_chunks = (L + time_chunk - 1) // time_chunk
    fwd_chunks = list(range(n_chunks))
    if reverse:                      # a reverse scan's adjoint runs forward
        fwd_chunks = fwd_chunks[::-1]

    if squeeze_lead:
        def load(ref, t0, tc):
            return ref[0, t0:t0 + tc].astype(jnp.float32)

        def store(ref, t0, tc, val):
            ref[0, t0:t0 + tc] = val
    else:
        def load(ref, t0, tc):
            return ref[t0:t0 + tc].astype(jnp.float32)

        def store(ref, t0, tc, val):
            ref[t0:t0 + tc] = val

    def chunk_steps(tc):
        return range(tc - 1, -1, -1) if reverse else range(tc)

    # ---- sweep 1: boundary states before each chunk (scan direction) ----
    h = jnp.zeros((n, d, bb), jnp.float32)
    bounds = {}
    for c in fwd_chunks:
        t0 = c * time_chunk
        tc = min(time_chunk, L - t0)
        bounds[c] = h
        dt_c = load(dt_ref, t0, tc)                           # (Tc, d, bb)
        dA_c = jnp.exp(dt_c[:, None] * At[None, :, :, None])  # (Tc, n, d, bb)
        dBu_c = (dt_c * load(u_ref, t0, tc))[:, None] \
            * load(b_ref, t0, tc)[:, :, None, :]
        for t in chunk_steps(tc):
            h = dA_c[t] * h + dBu_c[t]

    # ---- sweep 2: adjoint, chunks in anti-scan order ----
    lam = jnp.zeros((n, d, bb), jnp.float32)
    dA_next = jnp.zeros((n, d, bb), jnp.float32)    # dA_{t+1}; zero past end
    dA_total = jnp.zeros((n, d), jnp.float32)
    dD_total = jnp.zeros((1, d), jnp.float32)
    for c in reversed(fwd_chunks):
        t0 = c * time_chunk
        tc = min(time_chunk, L - t0)
        u_c = load(u_ref, t0, tc)                             # (Tc, d, bb)
        dt_c = load(dt_ref, t0, tc)
        B_c = load(b_ref, t0, tc)                             # (Tc, n, bb)
        C_c = load(c_ref, t0, tc)
        g_c = load(g_ref, t0, tc)                             # (Tc, d, bb)
        dA_c = jnp.exp(dt_c[:, None] * At[None, :, :, None])
        dBu_c = (dt_c * u_c)[:, None] * B_c[:, :, None, :]

        # recompute h trajectory through the chunk
        h = bounds[c]
        hs_prev = [None] * tc
        hs = [None] * tc
        for t in chunk_steps(tc):
            hs_prev[t] = h
            h = dA_c[t] * h + dBu_c[t]
            hs[t] = h
        Hp_c = jnp.stack(hs_prev, axis=0)           # h before step t
        H_c = jnp.stack(hs, axis=0)                 # h after step t

        # adjoint recurrence through the chunk (anti-scan order)
        lams = [None] * tc
        adj_steps = (range(tc) if reverse else range(tc - 1, -1, -1))
        for t in adj_steps:
            cg = C_c[t][:, None, :] * g_c[t][None, :, :]      # (n, d, bb)
            lam = cg + dA_next * lam
            dA_next = dA_c[t]
            lams[t] = lam
        Lam_c = jnp.stack(lams, axis=0)             # (Tc, n, d, bb)

        ddA_c = Lam_c * Hp_c
        S_c = jnp.sum(Lam_c * B_c[:, :, None, :], axis=1)     # (Tc, d, bb)
        T_c = jnp.sum(ddA_c * dA_c * At[None, :, :, None], axis=1)
        store(ddt_ref, t0, tc, (T_c + u_c * S_c).astype(ddt_ref.dtype))
        store(du_ref, t0, tc,
              (dt_c * S_c + Dv[..., None] * g_c).astype(du_ref.dtype))
        store(db_ref, t0, tc, jnp.sum(
            Lam_c * (dt_c * u_c)[:, None], axis=2).astype(db_ref.dtype))
        store(dc_ref, t0, tc, jnp.sum(
            H_c * g_c[:, None], axis=2).astype(dc_ref.dtype))
        dA_total += jnp.sum(ddA_c * dA_c * dt_c[:, None], axis=(0, 3))
        dD_total += jnp.sum(g_c * u_c, axis=(0, 2))[None]

    dA_ref[...] += dA_total
    dD_ref[...] += dD_total


def _pallas_backward(u, dt, A, B, C, D, g, block_b: int,
                     reverse: bool = False, lane_major_io: bool = False):
    in_dtypes = (u.dtype, dt.dtype, A.dtype, B.dtype, C.dtype, D.dtype)
    u, dt, B, C, g = (x.astype(jnp.float32) for x in (u, dt, B, C, g))
    A = A.astype(jnp.float32)
    D = D.astype(jnp.float32)
    n = A.shape[-1]
    if lane_major_io and u.ndim == 4:
        ns, L, d, b = u.shape
        pad = (-b) % block_b
        if pad:
            z = lambda x: jnp.concatenate(
                [x, jnp.zeros(x.shape[:3] + (pad,), x.dtype)], axis=3)
            u, dt, B, C, g = z(u), z(dt), z(B), z(C), z(g)
        bt = u.shape[3]
        seq_spec = lambda ch: pl.BlockSpec(
            (1, L, ch, block_b), lambda s, i: (s, 0, 0, i),
            memory_space=pltpu.VMEM)
        fix_spec = lambda sh: pl.BlockSpec(sh, lambda s, i: (0,) * len(sh),
                                           memory_space=pltpu.VMEM)
        f32 = jnp.float32
        du, ddt, dB, dC, dA, dD = pl.pallas_call(
            partial(_scan_bwd_kernel, reverse=reverse, squeeze_lead=True),
            grid=(ns, bt // block_b),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            in_specs=[seq_spec(d), seq_spec(d), fix_spec((n, d)),
                      seq_spec(n), seq_spec(n), fix_spec((1, d)),
                      seq_spec(d)],
            out_specs=[seq_spec(d), seq_spec(d), seq_spec(n), seq_spec(n),
                       fix_spec((n, d)), fix_spec((1, d))],
            out_shape=[jax.ShapeDtypeStruct((ns, L, d, bt), f32),
                       jax.ShapeDtypeStruct((ns, L, d, bt), f32),
                       jax.ShapeDtypeStruct((ns, L, n, bt), f32),
                       jax.ShapeDtypeStruct((ns, L, n, bt), f32),
                       jax.ShapeDtypeStruct((n, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32)],
        )(u, dt, A.T, B, C, D[None], g)
        bk = lambda x: x[..., :b]
        outs = (bk(du), bk(ddt), dA.T, bk(dB), bk(dC), dD[0])
        return tuple(o.astype(t) for o, t in zip(outs, in_dtypes))
    if lane_major_io:
        L, d, b = u.shape
        pad = (-b) % block_b
        if pad:
            z = lambda x: jnp.concatenate(
                [x, jnp.zeros(x.shape[:2] + (pad,), x.dtype)], axis=2)
            u, dt, B, C, g = z(u), z(dt), z(B), z(C), z(g)
        bt = u.shape[2]
    else:
        b, L, d = u.shape
        pad = (-b) % block_b
        if pad:
            z = lambda x: jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
            u, dt, B, C, g = z(u), z(dt), z(B), z(C), z(g)
        bt = u.shape[0]
        tp = lambda x: jnp.transpose(x, (1, 2, 0))
        u, dt, B, C, g = tp(u), tp(dt), tp(B), tp(C), tp(g)

    seq_spec = lambda ch: pl.BlockSpec((L, ch, block_b),
                                       lambda i: (0, 0, i),
                                       memory_space=pltpu.VMEM)
    fix_spec = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                      memory_space=pltpu.VMEM)
    f32 = jnp.float32
    du, ddt, dB, dC, dA, dD = pl.pallas_call(
        partial(_scan_bwd_kernel, reverse=reverse),
        grid=(bt // block_b,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[seq_spec(d), seq_spec(d), fix_spec((n, d)), seq_spec(n),
                  seq_spec(n), fix_spec((1, d)), seq_spec(d)],
        out_specs=[seq_spec(d), seq_spec(d), seq_spec(n), seq_spec(n),
                   fix_spec((n, d)), fix_spec((1, d))],
        out_shape=[jax.ShapeDtypeStruct((L, d, bt), f32),
                   jax.ShapeDtypeStruct((L, d, bt), f32),
                   jax.ShapeDtypeStruct((L, n, bt), f32),
                   jax.ShapeDtypeStruct((L, n, bt), f32),
                   jax.ShapeDtypeStruct((n, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32)],
    )(u, dt, A.T, B, C, D[None], g)
    if lane_major_io:
        bk = lambda x: x[:, :, :b]
    else:
        bk = lambda x: jnp.transpose(x, (2, 0, 1))[:b]
    outs = (bk(du), bk(ddt), dA.T, bk(dB), bk(dC), dD[0])
    return tuple(o.astype(t) for o, t in zip(outs, in_dtypes))


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def selective_scan_pallas(u, dt, A, B, C, D, block_b: int = 128,
                          reverse: bool = False,
                          lane_major_io: bool = False):
    """``lane_major_io=True``: u/dt (L, d, b), B/C (L, n, b), y (L, d, b) —
    the kernel's native layout, no edge transposes."""
    return _pallas_forward(u, dt, A, B, C, D, block_b, reverse,
                           lane_major_io)


def _fwd(u, dt, A, B, C, D, block_b, reverse, lane_major_io):
    return (_pallas_forward(u, dt, A, B, C, D, block_b, reverse,
                            lane_major_io),
            (u, dt, A, B, C, D))


def _lane_to_batch(x):
    """(L, ch, b) -> (b, L, ch); (ns, L, ch, b) -> (ns*b, L, ch)."""
    if x.ndim == 4:
        ns, L, ch, b = x.shape
        return jnp.moveaxis(x, 3, 1).reshape(ns * b, L, ch)
    return jnp.transpose(x, (2, 0, 1))


def _batch_to_lane(y, like):
    if like.ndim == 4:
        ns, L, ch, b = like.shape
        return jnp.moveaxis(y.reshape(ns, b, L, y.shape[-1]), 1, 3)
    return jnp.transpose(y, (1, 2, 0))


def _bwd(block_b, reverse, lane_major_io, res, g):
    u, dt, A, B, C, D = res
    if jax.default_backend() == "tpu":
        return _pallas_backward(u, dt, A, B, C, D, g, block_b, reverse,
                                lane_major_io)
    if lane_major_io:
        bm = _lane_to_batch
        _, vjp = jax.vjp(partial(selective_scan, reverse=reverse),
                         bm(u), bm(dt), A, bm(B), bm(C), D)
        outs = vjp(bm(g))
        return (_batch_to_lane(outs[0], u), _batch_to_lane(outs[1], dt),
                outs[2], _batch_to_lane(outs[3], B),
                _batch_to_lane(outs[4], C), outs[5])
    _, vjp = jax.vjp(partial(selective_scan, reverse=reverse),
                     u, dt, A, B, C, D)
    return vjp(g)


selective_scan_pallas.defvjp(_fwd, _bwd)


def selective_scan_auto(u, dt, A, B, C, D, use_pallas: bool = True,
                        block_b: int = 128, reverse: bool = False,
                        lane_major_io: bool = False):
    """Pallas kernel on TPU, associative scan elsewhere (CPU tests)."""
    if use_pallas and jax.default_backend() == "tpu":
        return selective_scan_pallas(u, dt, A, B, C, D, block_b, reverse,
                                     lane_major_io)
    if lane_major_io:
        y = selective_scan(_lane_to_batch(u), _lane_to_batch(dt), A,
                           _lane_to_batch(B), _lane_to_batch(C), D,
                           reverse=reverse)
        return _batch_to_lane(y, u)
    return selective_scan(u, dt, A, B, C, D, reverse=reverse)
