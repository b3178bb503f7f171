"""VPU outer-product scores variant for the MHST heads-attention kernel.

The shipped masked-dots kernel (kern G / fused_attention_heads) is at its
padding-limited MXU ceiling at the MHST shape (n=65, h=16, hd=4): every
per-head dot is (65,64)x(64,65), so M and N pad 65->128 and K runs 64 of
128 — ~13% utilization BY SHAPE (perf/ROOFLINE.md "Why MHST stops at
~20k"). This probe tries the one formulation that escapes the padding:
compute the scores on the VPU as hd=4 rank-1 updates,

    S_h = sum_{c<4} q[:, :, h*4+c] (outer) k[:, :, h*4+c]

i.e. per channel a lane-broadcast of a q column times a sublane-broadcast
of a k row — no dots, no 4D product tensor (variant C's (bb,65,65,4)
tensor died in Mosaic with "Only 2D gather"; this stays rank 3
throughout). k arrives pre-transposed (bb, C, n) from XLA (a cheap HBM
transpose of 34 MB bf16) so each k row is a SUBLANE slice. PV keeps the
masked full-width MXU dot of kern G (its N=64 is the one well-used axis).

VPU work: B*h*hd*n*128(lane pad) FMAs ~ 4.4 Gop f32 ~ 1.1 ms at the v5e
VPU peak vs ~2.0 ms of padded MXU passes it replaces — plus whatever
Mosaic overhead differs. Variants:

  H  — VPU scores (per-channel lane slices of q), masked-dot PV
  G  — the shipped kernel re-measured in the same process (baseline)

Usage:  timeout 1500 python perf/mhst_attn_vpu.py            (TPU)
        JAX_PLATFORMS=cpu python perf/mhst_attn_vpu.py --interpret
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

INTERPRET = "--interpret" in sys.argv
B, N, H, HD = (256, 65, 16, 4) if INTERPRET else (4096, 65, 16, 4)
C = H * HD
DT = jnp.bfloat16
SCALE = HD ** -0.5


def kern_h(q_ref, kt_ref, v_ref, o_ref):
    q = q_ref[...].astype(jnp.float32)      # (bb, n, C)
    kt = kt_ref[...].astype(jnp.float32)    # (bb, C, n)
    v = v_ref[...]
    bb, n, c = q.shape
    head_of_lane = jax.lax.broadcasted_iota(jnp.int32, (bb, n, c), 2) // HD
    acc = jnp.zeros((bb, n, c), jnp.float32)
    for i in range(H):
        s = jnp.zeros((bb, n, n), jnp.float32)
        for ci in range(HD):
            lane = i * HD + ci
            # (bb, n, 1) lane-broadcast * (bb, 1, n) sublane-broadcast
            s = s + q[:, :, lane:lane + 1] * kt[:, lane:lane + 1, :]
        s = s * SCALE
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        vh = jnp.where(head_of_lane == i, v, jnp.zeros_like(v))
        acc = acc + jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def kern_g(q_ref, k_ref, v_ref, o_ref):
    # the shipped masked-dots kernel (ops/attention.py:_make_heads_kernel
    # minus the residual), re-measured here as the same-process baseline
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
            preferred_element_type=jnp.float32) * SCALE
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        vh = jnp.where(head_of_lane == i, v, jnp.zeros_like(v))
        acc = acc + jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def run(kernel, block_g, label, ref, kt_input=False):
    pad = (-B) % block_g
    spec = pl.BlockSpec((block_g, N, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    kspec = (pl.BlockSpec((block_g, C, N), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM) if kt_input else spec)

    def f(q, k, v):
        k2 = jnp.swapaxes(k, 1, 2) if kt_input else k
        return pl.pallas_call(
            kernel, grid=((B + pad) // block_g,),
            in_specs=[spec, kspec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B + pad, N, C), DT),
            interpret=INTERPRET)(q, k2, v)[:B]

    f = jax.jit(f)
    try:
        out = f(qf, kf, vf)
        _ = float(jnp.sum(out.astype(jnp.float32)))
    except Exception as e:
        print(f"{label}: FAILED {str(e)[:200]}", flush=True)
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

if INTERPRET:
    run(kern_h, 32, "H vpu scores, block_g=32 (interpret)", ref,
        kt_input=True)
else:
    for bg in (32, 16, 8):
        run(kern_h, bg, f"H vpu scores, block_g={bg}", ref, kt_input=True)
    run(kern_g, 32, "G masked full dots, block_g=32", ref)
