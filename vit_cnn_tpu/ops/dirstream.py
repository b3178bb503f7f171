"""Fused directional-stream kernels for the multi-directional Mamba layer.

The round-2b profile (perf/ROOFLINE.md) showed the 10-direction token
permutes (~10 ms per 4096-window chunk even as one-hot MXU matmuls), the
dual causal convs (~5 ms) and the inverse-permute sum (~10 ms) dominating
the NON-scan part of the mixer. All three are pure STATIC index movement
plus a depthwise k=4 conv — one HBM read of ``u`` suffices:

* :func:`dir_conv_silu` — ONE Pallas kernel reads the lane-major
  (L, d, batch) activation block once into VMEM and, per direction,
  gathers the static ordering, applies the causal (forward streams) or
  anti-causal (reverse streams) depthwise conv as shifted adds, the bias
  and SiLU — emitting every stream the scan kernel consumes, with zero
  intermediate HBM round-trips (vs: one-hot matmul -> HBM -> XLA conv ->
  HBM -> SiLU).
* :func:`inv_perm_weighted_sum` — the inverse: per-stream inverse
  ordering + weighted accumulation into the original token order, f32
  accumulate, one output block.

Both are ``jax.custom_vjp`` with backward = XLA differentiation of the
reference formulation (flash-style recompute; these ops are cheap relative
to the scan backward). Reference functions double as the CPU fallback.

Ref for the behavior being fused: Mutimodality_Mamba7.py:608-701 (the
directional gathers + shared MambaMixer conv stage).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.envflags import kernel_gate


# ---------------------------------------------------------------------------
# Reference formulation (CPU fallback + custom_vjp backward)
# ---------------------------------------------------------------------------

def _conv_shift_ref(pu, cw, cb, reverse: bool):
    """Depthwise causal (or anti-causal) k-tap conv over axis 0 of a
    lane-major (L, d, b) array, as shifted adds: identical math to
    nn.CausalDWConv with WCN dimension numbers."""
    L = pu.shape[0]
    k = cw.shape[0]
    acc = jnp.zeros_like(pu) + cb.astype(pu.dtype)[None, :, None]
    for j in range(k):
        s = k - 1 - j
        if s == 0:
            seg = pu
        elif reverse:
            seg = jnp.concatenate(
                [pu[s:], jnp.zeros((s,) + pu.shape[1:], pu.dtype)], axis=0)
        else:
            seg = jnp.concatenate(
                [jnp.zeros((s,) + pu.shape[1:], pu.dtype), pu[:L - s]],
                axis=0)
        acc = acc + cw[j].astype(pu.dtype)[None, :, None] * seg
    return acc


def dir_conv_silu_reference(u_lm, cw, cb, orders: Tuple[Tuple[int, ...], ...],
                            rev_rows: Tuple[int, ...]):
    """u_lm: (L, d, b). Returns (fwd (nb, L, d, b), rev (nr, L, d, b))."""
    fwd = []
    for order in orders:
        pu = u_lm[jnp.asarray(np.asarray(order))]
        fwd.append(jax.nn.silu(_conv_shift_ref(pu, cw, cb, False)))
    fwd = jnp.stack(fwd, axis=0)
    if not rev_rows:
        return fwd, jnp.zeros((0,) + u_lm.shape, u_lm.dtype)
    rev = []
    for r in rev_rows:
        pu = u_lm[jnp.asarray(np.asarray(orders[r]))]
        rev.append(jax.nn.silu(_conv_shift_ref(pu, cw, cb, True)))
    return fwd, jnp.stack(rev, axis=0)


def inv_perm_weighted_sum_reference(y_fwd, y_rev, inv_orders, rev_rows,
                                    w_fwd, w_rev):
    """y_fwd: (nb, L, d, b) in permuted order; y_rev: (nr, L, d, b) on the
    same base orderings. Returns (L, d, b) f32: the directions' weighted
    contributions inverse-scattered back to the original token order."""
    out = jnp.zeros(y_fwd.shape[1:], jnp.float32)
    for i, inv in enumerate(inv_orders):
        idx = jnp.asarray(np.asarray(inv))
        out = out + w_fwd[i] * y_fwd[i][idx].astype(jnp.float32)
    for j, r in enumerate(rev_rows):
        idx = jnp.asarray(np.asarray(inv_orders[r]))
        out = out + w_rev[j] * y_rev[j][idx].astype(jnp.float32)
    return out.astype(y_fwd.dtype)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _dir_conv_kernel(u_ref, cw_ref, cb_ref, fwd_ref, rev_ref, *,
                     orders, rev_rows, k):
    u = u_ref[...].astype(jnp.float32)                  # (L, d, bb)
    cw = cw_ref[...].astype(jnp.float32)                # (k, d)
    cb = cb_ref[...].astype(jnp.float32)                # (1, d)
    L, d, bb = u.shape

    def conv_silu(pu, reverse):
        acc = jnp.zeros((L, d, bb), jnp.float32) + cb[0][None, :, None]
        for j in range(k):
            s = k - 1 - j
            if s == 0:
                seg = pu
            elif reverse:
                seg = jnp.concatenate(
                    [pu[s:], jnp.zeros((s, d, bb), jnp.float32)], axis=0)
            else:
                seg = jnp.concatenate(
                    [jnp.zeros((s, d, bb), jnp.float32), pu[:L - s]], axis=0)
            acc = acc + cw[j][None, :, None] * seg
        return acc * jax.nn.sigmoid(acc)                # SiLU

    for n, order in enumerate(orders):
        # static permutation as pure row slices (pallas kernels may not
        # capture constant index arrays; Mosaic lowers these to copies)
        pu = jnp.concatenate([u[i:i + 1] for i in order], axis=0)
        fwd_ref[n] = conv_silu(pu, False).astype(fwd_ref.dtype)
        if n in rev_rows:
            r = rev_rows.index(n)
            rev_ref[r] = conv_silu(pu, True).astype(rev_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def dir_conv_silu(u_lm, cw, cb, orders, rev_rows, block_b: int = 128):
    """Fused directional permute + causal/anti-causal depthwise conv +
    SiLU. u_lm: (L, d, b) lane-major; orders/rev_rows static tuples.
    Returns (fwd (nb, L, d, b), rev (nr, L, d, b))."""
    return _dir_conv_forward(u_lm, cw, cb, orders, rev_rows, block_b)


def _dir_conv_forward(u_lm, cw, cb, orders, rev_rows, block_b):
    if jax.default_backend() != "tpu":
        return dir_conv_silu_reference(u_lm, cw, cb, orders, rev_rows)
    L, d, b = u_lm.shape
    nb, nr = len(orders), len(rev_rows)
    k = cw.shape[0]
    pad = (-b) % block_b
    if pad:
        u_lm = jnp.concatenate(
            [u_lm, jnp.zeros((L, d, pad), u_lm.dtype)], axis=2)
    bt = u_lm.shape[2]

    spec_u = pl.BlockSpec((L, d, block_b), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_o = lambda n: pl.BlockSpec((n, L, d, block_b),
                                    lambda i: (0, 0, 0, i),
                                    memory_space=pltpu.VMEM)
    fix = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                 memory_space=pltpu.VMEM)
    fwd, rev = pl.pallas_call(
        partial(_dir_conv_kernel, orders=tuple(map(tuple, orders)),
                rev_rows=tuple(rev_rows), k=k),
        grid=(bt // block_b,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[spec_u, fix((k, d)), fix((1, d))],
        out_specs=[spec_o(nb), spec_o(max(nr, 1))],
        out_shape=[jax.ShapeDtypeStruct((nb, L, d, bt), u_lm.dtype),
                   jax.ShapeDtypeStruct((max(nr, 1), L, d, bt), u_lm.dtype)],
    )(u_lm, cw, cb[None])
    fwd = fwd[..., :b]
    rev = rev[..., :b] if nr else jnp.zeros((0, L, d, b), u_lm.dtype)
    return fwd, rev


def _dir_conv_adjoint(u_lm, cw, cb, gf, gr, orders, rev_rows, block_b):
    """Fused TPU adjoint. Returns (du, dcw, dcb) in the primal dtypes."""
    L, d, b = u_lm.shape
    nb, nr = len(orders), len(rev_rows)
    k = cw.shape[0]
    inv_orders = tuple(tuple(int(np.argwhere(np.asarray(o) == t)[0, 0])
                             for t in range(L)) for o in orders)
    pad = (-b) % block_b
    z3 = lambda x: (jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
        if pad else x)
    u_p, gf_p = z3(u_lm), z3(gf)
    gr_p = z3(gr) if nr else jnp.zeros((1, L, d, u_p.shape[2]), gf.dtype)
    bt = u_p.shape[2]
    grid = bt // block_b

    spec_u = pl.BlockSpec((L, d, block_b), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_g = lambda n: pl.BlockSpec((n, L, d, block_b),
                                    lambda i: (0, 0, 0, i),
                                    memory_space=pltpu.VMEM)
    fix = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                 memory_space=pltpu.VMEM)
    part = lambda s: pl.BlockSpec((1,) + s, lambda i: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    du, dcw_p, dcb_p = pl.pallas_call(
        partial(_dir_conv_adj_kernel,
                orders=tuple(map(tuple, orders)), inv_orders=inv_orders,
                rev_rows=tuple(rev_rows), k=k),
        grid=(grid,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[spec_u, fix((k, d)), fix((1, d)), spec_g(nb),
                  spec_g(max(nr, 1))],
        out_specs=[spec_u, part((k, d)), part((1, d))],
        out_shape=[jax.ShapeDtypeStruct((L, d, bt), u_lm.dtype),
                   jax.ShapeDtypeStruct((grid, k, d), jnp.float32),
                   jax.ShapeDtypeStruct((grid, 1, d), jnp.float32)],
    )(u_p, cw, cb[None], gf_p, gr_p)
    du = du[..., :b]
    dcw = jnp.sum(dcw_p, axis=0).astype(cw.dtype)
    dcb = jnp.sum(dcb_p, axis=0)[0].astype(cb.dtype)
    return du, dcw, dcb


def _dir_conv_adj_kernel(u_ref, cw_ref, cb_ref, gf_ref, gr_ref,
                                du_ref, dcw_ref, dcb_ref, *,
                                orders, inv_orders, rev_rows, k):
    """Fused adjoint of the permute+depthwise-conv+SiLU forward: one VMEM
    pass recomputes the biased preactivation z (SiLU' is evaluated at z,
    bias included) and accumulates du / dcw / dcb for every direction."""
    u = u_ref[...].astype(jnp.float32)                  # (L, d, bb)
    cw = cw_ref[...].astype(jnp.float32)                # (k, d)
    cb = cb_ref[...].astype(jnp.float32)                # (1, d)
    L, d, bb = u.shape

    def shift(x, s, reverse):
        if s == 0:
            return x
        if reverse:
            return jnp.concatenate(
                [x[s:], jnp.zeros((s, d, bb), jnp.float32)], axis=0)
        return jnp.concatenate(
            [jnp.zeros((s, d, bb), jnp.float32), x[:L - s]], axis=0)

    du = jnp.zeros((L, d, bb), jnp.float32)
    # per-tap rows as a python list: in-kernel .at[j].add would be a
    # scatter, which Mosaic does not support
    dcw_rows = [jnp.zeros((d,), jnp.float32) for _ in range(k)]
    dcb = jnp.zeros((1, d), jnp.float32)
    for n, order in enumerate(orders):
        pu = jnp.concatenate([u[i:i + 1] for i in order], axis=0)
        streams = [(False, gf_ref[n])]
        if n in rev_rows:
            streams.append((True, gr_ref[rev_rows.index(n)]))
        dpu = jnp.zeros((L, d, bb), jnp.float32)
        for reverse, graw in streams:
            g = graw.astype(jnp.float32)
            z = jnp.zeros((L, d, bb), jnp.float32) + cb[0][None, :, None]
            for j in range(k):
                z = z + cw[j][None, :, None] * shift(pu, k - 1 - j, reverse)
            sig = jax.nn.sigmoid(z)
            dz = g * sig * (1.0 + z * (1.0 - sig))
            dcb = dcb + jnp.sum(dz, axis=(0, 2))[None]
            for j in range(k):
                s = k - 1 - j
                dcw_rows[j] = dcw_rows[j] + jnp.sum(
                    dz * shift(pu, s, reverse), axis=(0, 2))
                dpu = dpu + cw[j][None, :, None] * shift(dz, s, not reverse)
        du = du + jnp.concatenate(
            [dpu[i:i + 1] for i in inv_orders[n]], axis=0)
    du_ref[...] = du.astype(du_ref.dtype)
    dcw_ref[...] = jnp.stack(dcw_rows)[None].astype(dcw_ref.dtype)
    dcb_ref[...] = dcb[None].astype(dcb_ref.dtype)


def _dcs_fwd(u_lm, cw, cb, orders, rev_rows, block_b):
    return (_dir_conv_forward(u_lm, cw, cb, orders, rev_rows, block_b),
            (u_lm, cw, cb))


def _dcs_bwd(orders, rev_rows, block_b, res, g):
    u_lm, cw, cb = res
    # default ON since 2026-08-19 (round 5): the DECISIVE experiment is
    # the in-step A/B, not the round-4 standalone microbench. Numerics
    # passed on the real chip in round 4 (rel diffs <= 7e-3,
    # perf/logs/dirstream_check_r4_pass.log); the standalone 2.65 ms/grad
    # vs 0.156 ms reading that justified the old OFF default came from a
    # 2-direction scan-free stand-in and did NOT transfer to the real
    # train step, where XLA's vjp must re-run the full unfused
    # 10-stream forward: profile_train A/B (perf/logs/train_ab_r5.log)
    # measured backward 37.63 -> 31.21 ms and train throughput
    # 18,170 -> 19,749 patches/s/chip with the fused adjoints.
    if kernel_gate("VCT_DIRSTREAM_FUSED_BWD", "1"):
        # fused adjoint: one HBM pass (the XLA path re-runs the UNFUSED
        # permute->conv->SiLU forward and differentiates it — the very
        # traffic the fused forward eliminated; see ROOFLINE round-3
        # train section)
        return _dir_conv_adjoint(u_lm, cw, cb, g[0], g[1], orders,
                                 rev_rows, block_b)
    _, vjp = jax.vjp(
        lambda u, w, b: dir_conv_silu_reference(u, w, b, orders, rev_rows),
        u_lm, cw, cb)
    return vjp(g)


dir_conv_silu.defvjp(_dcs_fwd, _dcs_bwd)


def _inv_sum_kernel(yf_ref, yr_ref, wf_ref, wr_ref, o_ref, *,
                    inv_orders, rev_rows):
    nb = yf_ref.shape[0]
    L, d, bb = yf_ref.shape[1:]
    acc = jnp.zeros((L, d, bb), jnp.float32)
    wf = wf_ref[...].astype(jnp.float32)                # (1, nb)
    wr = wr_ref[...].astype(jnp.float32)                # (1, max(nr,1))
    def gather_rows(block, inv):
        return jnp.concatenate([block[i:i + 1] for i in inv], axis=0)

    for i in range(nb):
        acc = acc + wf[0, i] * gather_rows(
            yf_ref[i].astype(jnp.float32), inv_orders[i])
    for j, r in enumerate(rev_rows):
        acc = acc + wr[0, j] * gather_rows(
            yr_ref[j].astype(jnp.float32), inv_orders[r])
    o_ref[...] = acc.astype(o_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def inv_perm_weighted_sum(y_fwd, y_rev, w_fwd, w_rev, inv_orders, rev_rows,
                          block_b: int = 128):
    """Fused inverse permute + per-direction weighting + direction sum.
    y_fwd: (nb, L, d, b); y_rev: (nr, L, d, b); w_*: runtime weights.
    Returns (L, d, b) in y_fwd.dtype (f32 accumulation inside)."""
    return _inv_sum_forward(y_fwd, y_rev, w_fwd, w_rev, inv_orders,
                            rev_rows, block_b)


def _inv_sum_forward(y_fwd, y_rev, w_fwd, w_rev, inv_orders, rev_rows,
                     block_b):
    if jax.default_backend() != "tpu":
        return inv_perm_weighted_sum_reference(y_fwd, y_rev, inv_orders,
                                               rev_rows, w_fwd, w_rev)
    nb, L, d, b = y_fwd.shape
    nr = y_rev.shape[0]
    pad = (-b) % block_b
    if pad:
        z = lambda x: jnp.concatenate(
            [x, jnp.zeros(x.shape[:3] + (pad,), x.dtype)], axis=3)
        y_fwd = z(y_fwd)
        y_rev = z(y_rev) if nr else y_rev
    if not nr:
        y_rev = jnp.zeros((1, L, d, y_fwd.shape[3]), y_fwd.dtype)
        w_rev = jnp.zeros((1,), jnp.float32)
    bt = y_fwd.shape[3]

    spec = lambda n: pl.BlockSpec((n, L, d, block_b),
                                  lambda i: (0, 0, 0, i),
                                  memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((L, d, block_b), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    fix = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_inv_sum_kernel, inv_orders=tuple(map(tuple, inv_orders)),
                rev_rows=tuple(rev_rows)),
        grid=(bt // block_b,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[spec(nb), spec(max(nr, 1)), fix((1, nb)),
                  fix((1, max(nr, 1)))],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((L, d, bt), y_fwd.dtype),
    )(y_fwd, y_rev, w_fwd.astype(jnp.float32)[None],
      w_rev.astype(jnp.float32)[None])
    return out[..., :b]


def _inv_sum_adj_kernel(g_ref, yf_ref, yr_ref, wf_ref, wr_ref,
                        dyf_ref, dyr_ref, dwf_ref, dwr_ref, *,
                        orders, rev_rows):
    """Adjoint: out[t] = sum_i w_i * y_i[inv_i[t]]  =>
    dy_i = w_i * g[order_i]  (order_i = inverse of inv_i) and
    dw_i = sum(g[order_i] * y_i) — per-grid-cell partials for dw."""
    g = g_ref[...].astype(jnp.float32)                  # (L, d, bb)
    wf = wf_ref[...].astype(jnp.float32)                # (1, nb)
    wr = wr_ref[...].astype(jnp.float32)                # (1, max(nr,1))
    nb = yf_ref.shape[0]
    dwf = []
    dwr = []
    for i in range(nb):
        pg = jnp.concatenate([g[t:t + 1] for t in orders[i]], axis=0)
        dyf_ref[i] = (wf[0, i] * pg).astype(dyf_ref.dtype)
        dwf.append(jnp.sum(pg * yf_ref[i].astype(jnp.float32)))
    for j, r in enumerate(rev_rows):
        pg = jnp.concatenate([g[t:t + 1] for t in orders[r]], axis=0)
        dyr_ref[j] = (wr[0, j] * pg).astype(dyr_ref.dtype)
        dwr.append(jnp.sum(pg * yr_ref[j].astype(jnp.float32)))
    # partials are (1, 1, n)-blocked: a 2-D (1, n) block has a
    # second-to-last dim of 1 vs a grid-sized array dim, which the TPU
    # lowering rejects (only the last TWO dims may differ from the array
    # when tile-aligned); the extra unit dim puts the grid index in an
    # unconstrained leading position (2026-08-19 hardware gate failure)
    dwf_ref[...] = jnp.stack(dwf)[None, None]
    if rev_rows:
        dwr_ref[...] = jnp.stack(dwr)[None, None]
    else:
        dwr_ref[...] = jnp.zeros(dwr_ref.shape, dwr_ref.dtype)


def _inv_sum_adjoint(y_fwd, y_rev, w_fwd, w_rev, g, inv_orders, rev_rows,
                     block_b):
    nb, L, d, b = y_fwd.shape
    nr = y_rev.shape[0]
    orders = tuple(tuple(int(np.argwhere(np.asarray(inv) == t)[0, 0])
                         for t in range(L)) for inv in inv_orders)
    pad = (-b) % block_b
    z3 = lambda x: (jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
        if pad else x)
    g_p, yf_p = z3(g), z3(y_fwd)
    yr_p = z3(y_rev) if nr else jnp.zeros((1, L, d, g_p.shape[2]), g.dtype)
    bt = g_p.shape[2]
    grid = bt // block_b

    spec_g = pl.BlockSpec((L, d, block_b), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec = lambda n: pl.BlockSpec((n, L, d, block_b),
                                  lambda i: (0, 0, 0, i),
                                  memory_space=pltpu.VMEM)
    fix = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                 memory_space=pltpu.VMEM)
    part = lambda n: pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    dyf, dyr, dwf_p, dwr_p = pl.pallas_call(
        partial(_inv_sum_adj_kernel, orders=orders,
                rev_rows=tuple(rev_rows)),
        grid=(grid,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[spec_g, spec(nb), spec(max(nr, 1)), fix((1, nb)),
                  fix((1, max(nr, 1)))],
        out_specs=[spec(nb), spec(max(nr, 1)), part(nb), part(max(nr, 1))],
        out_shape=[jax.ShapeDtypeStruct((nb, L, d, bt), y_fwd.dtype),
                   jax.ShapeDtypeStruct((max(nr, 1), L, d, bt),
                                        y_fwd.dtype),
                   jax.ShapeDtypeStruct((grid, 1, nb), jnp.float32),
                   jax.ShapeDtypeStruct((grid, 1, max(nr, 1)),
                                        jnp.float32)],
    )(g_p, yf_p, yr_p, w_fwd.astype(jnp.float32)[None],
      (w_rev if nr else jnp.zeros((1,), jnp.float32)
       ).astype(jnp.float32)[None])
    dyf = dyf[..., :b]
    dyr = dyr[..., :b] if nr else jnp.zeros((0, L, d, b), y_fwd.dtype)
    dwf = jnp.sum(dwf_p, axis=(0, 1)).astype(w_fwd.dtype)
    dwr = (jnp.sum(dwr_p, axis=(0, 1))[:nr].astype(w_rev.dtype) if nr
           else jnp.zeros_like(w_rev))
    return dyf, dyr, dwf, dwr


def _ips_fwd(y_fwd, y_rev, w_fwd, w_rev, inv_orders, rev_rows, block_b):
    return (_inv_sum_forward(y_fwd, y_rev, w_fwd, w_rev, inv_orders,
                             rev_rows, block_b),
            (y_fwd, y_rev, w_fwd, w_rev))


def _ips_bwd(inv_orders, rev_rows, block_b, res, g):
    y_fwd, y_rev, w_fwd, w_rev = res
    # default ON since 2026-08-19 (round 5) — same in-step A/B verdict as
    # _dcs_bwd: numerics hardware-verified in round 4
    # (perf/logs/dirstream_check_r4_pass.log), and the real train step
    # runs 18,170 -> 19,749 patches/s with the fused adjoint pair
    # (perf/logs/train_ab_r5.log; the old 17x standalone loss was an
    # artifact of the reduced stand-in)
    if kernel_gate("VCT_DIRSTREAM_FUSED_BWD", "1"):
        return _inv_sum_adjoint(y_fwd, y_rev, w_fwd, w_rev, g, inv_orders,
                                rev_rows, block_b)
    _, vjp = jax.vjp(
        lambda yf, yr, wf, wr: inv_perm_weighted_sum_reference(
            yf, yr, inv_orders, rev_rows, wf, wr),
        y_fwd, y_rev, w_fwd, w_rev)
    return vjp(g)


inv_perm_weighted_sum.defvjp(_ips_fwd, _ips_bwd)
