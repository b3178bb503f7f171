"""Mosaic-variant experiment for the MHST heads-attention kernel.

The straightforward per-head kernel (dot over hd=4 slices + lane
concatenate) fails remote Mosaic compilation with no error text, so this
probe tries formulations that avoid suspect constructs one at a time:

  A. original: per-head (bb,65,4) dots, jnp.concatenate on lanes
  B. per-head dots, direct o_ref[:, :, sl] stores (no concatenate)
  C. scores via VPU broadcast-mul-sum (no narrow dots), PV via dot
  E. all heads at once: product tensor + one-hot group-sum matmuls
     (no narrow slices, no lane splits at all)

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 1500 python perf/mhst_attn_variants.py
"""
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vct_jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from vit_cnn_tpu.ops.attention import attention_reference_heads  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, N, H, HD = 4096, 65, 16, 4
C = H * HD
DT = jnp.bfloat16
SCALE = HD ** -0.5


def kern_a(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    outs = []
    for i in range(H):
        sl = slice(i * HD, (i + 1) * HD)
        s = jax.lax.dot_general(q[:, :, sl], k[:, :, sl],
                                (((2,), (2,)), ((0,), (0,)))) * SCALE
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(p, v[:, :, sl],
                                        (((2,), (1,)), ((0,), (0,)))))
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def kern_b(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    for i in range(H):
        sl = slice(i * HD, (i + 1) * HD)
        s = jax.lax.dot_general(q[:, :, sl], k[:, :, sl],
                                (((2,), (2,)), ((0,), (0,)))) * SCALE
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p, v[:, :, sl],
                                (((2,), (1,)), ((0,), (0,))))
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def kern_c(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    for i in range(H):
        sl = slice(i * HD, (i + 1) * HD)
        # scores on the VPU: (bb, 65, 1, 4) * (bb, 1, 65, 4) -> sum lanes
        s = jnp.sum(q[:, :, None, sl] * k[:, None, :, sl], axis=-1) * SCALE
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p, v[:, :, sl],
                                (((2,), (1,)), ((0,), (0,))))
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def kern_f(q_ref, k_ref, v_ref, o_ref):
    # like B, but the dots run on bf16 operands with f32 accumulation:
    # an f32 MXU matmul decomposes into ~6 bf16 passes, so upcasting
    # before the dot sextuples the MXU work for nothing
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    for i in range(H):
        sl = slice(i * HD, (i + 1) * HD)
        s = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * SCALE
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def kern_g(q_ref, k_ref, v_ref, o_ref):
    # full-width masked dots: S_h = q @ (k * lane_mask_h)^T is a healthy
    # (65,64)@(64,65) MXU contraction (the mask zeroes other heads'
    # channels so the 64-wide dot sums only head h), and
    # O = sum_h P_h @ (v * lane_mask_h) lands each head's output in its
    # own lanes. No narrow dots, no lane concatenates; scores stay in VMEM.
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    bb, n, c = q.shape
    head_of_lane = jax.lax.broadcasted_iota(jnp.int32, (bb, n, c), 2) // HD
    acc = jnp.zeros((bb, n, c), jnp.float32)
    for i in range(H):
        kh = jnp.where(head_of_lane == i, k, jnp.zeros_like(k))
        s = jax.lax.dot_general(
            q, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * SCALE     # (bb, n, n)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        vh = jnp.where(head_of_lane == i, v, jnp.zeros_like(v))
        acc = acc + jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def kern_e(q_ref, k_ref, v_ref, gdn_ref, gup_ref, o_ref):
    # gdn (C, H): lane c -> head one-hot; gup (H, C): inverse broadcast
    g_dn = gdn_ref[...]
    g_up = gup_ref[...]
    q = q_ref[...].astype(jnp.float32)          # (bb, n, C)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    if True:
        bb = q.shape[0]
        # product tensor: per-channel q_i * k_j, then head group-sum on MXU
        prod = (q[:, :, None, :] * k[:, None, :, :]).reshape(bb, N * N, C)
        s = jax.lax.dot_general(prod, g_dn,
                                (((2,), (0,)), ((), ()))) * SCALE  # (bb,nn,H)
        s = s.reshape(bb, N, N, H)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)                # (bb,n,n,H)
        pexp = jax.lax.dot_general(p.reshape(bb, N * N, H), g_up,
                                   (((2,), (0,)), ((), ())))     # (bb,nn,C)
        o = jnp.sum(pexp.reshape(bb, N, N, C) * v[:, None, :, :], axis=2)
        o_ref[...] = o.astype(o_ref.dtype)


def run(kernel, block_g, label, ref, with_g=False):
    pad = (-B) % block_g
    spec = pl.BlockSpec((block_g, N, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    gspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [spec, spec, spec]
    extra = ()
    if with_g:
        in_specs += [gspec((C, H)), gspec((H, C))]
        extra = (g_dn, g_up)
    f = jax.jit(lambda q, k, v: pl.pallas_call(
        kernel, grid=((B + pad) // block_g,),
        in_specs=in_specs, out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B + pad, N, C), DT))(
            q, k, v, *extra)[:B])
    try:
        out = f(qf, kf, vf)
        _ = float(jnp.sum(out.astype(jnp.float32)))
    except Exception as e:
        print(f"{label}: FAILED {str(e)[:160]}", flush=True)
        return
    t0 = time.time()
    for _ in range(20):
        out = f(qf, kf, vf)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    ms = (time.time() - t0) / 20 * 1e3
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    print("%-36s %8.3f ms   max|diff|=%.2e" % (label, ms, err), flush=True)


key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
qf = jax.random.normal(kq, (B, N, C), DT)
kf = jax.random.normal(kk, (B, N, C), DT)
vf = jax.random.normal(kv, (B, N, C), DT)

heads = lambda t: t.reshape(B, N, H, HD)
ref = np.asarray(jax.jit(partial(attention_reference_heads, scale=SCALE))(
    heads(qf), heads(kf), heads(vf))).reshape(B, N, C).astype(np.float32)

g_dn = jnp.asarray(np.repeat(np.eye(H, dtype=np.float32), HD, axis=0))
g_up = g_dn.T

# measured 2026-08-17: A fails Mosaic (lane concatenate), C fails
# ("Only 2D gather"), E SIGKILLs the remote compiler (product-tensor IR
# blowup), B compiles at bg=32 only and gives 7.6 ms — barely under the
# 8.9 ms XLA einsum, because its f32 dots cost ~6 MXU passes each.
# F = B with bf16 operands + f32 accumulation.
# F measured 7.8-7.9 ms at bg=16/32 (bg=64 fails Mosaic): the per-head
# (bb,65,4) dots are latency-bound regardless of operand dtype.
# G replaces them with full-width masked dots.
for bg in (32, 64, 128):
    run(kern_g, bg, f"G masked full dots, block_g={bg}", ref)
