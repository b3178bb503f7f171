"""Round-3 sweep: eliminate the HBM transposes around the selective scan
by computing the WHOLE SSM-input pipeline (causal conv -> SiLU -> x_proj
-> dt_proj) in the kernel's lane-major (L, ch, batch) layout.

The round-2c decomposition (perf/ROOFLINE.md) showed the stage2 scan at
31.3 ms end-to-end vs 21.8 kernel-only: the gap is the 5 (b, L, ch) <->
(L, ch, b) transposes per stream (u/dt/B/C in + y out). Variants:

  A  current: batch-major conv (NWC) + projections, kernel transposes
     its own IO (5 transposes/stream)
  B  lane-major end-to-end: ONE transpose of u after in_proj, conv as
     WCN dimension_numbers, projections as (ldb,dk->lkb) einsums, kernel
     lane_major_io=True (0 kernel transposes; y stays (L, d, b) for the
     unpermute one-hot matmul to consume)
  C  like B but conv in NWC first, transpose conv output (1 transpose)

Run: PYTHONPATH=/root/.axon_site:/root/repo python perf/mixer_lane_sweep.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vit_cnn_tpu.ops.selective_scan import selective_scan_auto


def bench(fn, args, n=8, label="", grad=False):
    if grad:
        def loss(*a):
            return jnp.sum(fn(*a).astype(jnp.float32))
        f = jax.jit(jax.grad(loss, argnums=tuple(range(len(args)))))
    else:
        f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _i in range(n):
        out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / n
    print("%-54s %8.2f ms" % (label, dt * 1e3), flush=True)
    return dt


def causal_conv_nwc(u, kernel, bias, reverse=False):
    k = kernel.shape[0]
    kern = jnp.flip(kernel, axis=0) if reverse else kernel
    pad = [(0, k - 1)] if reverse else [(k - 1, 0)]
    y = jax.lax.conv_general_dilated(
        u, kern.astype(u.dtype), window_strides=(1,), padding=pad,
        feature_group_count=u.shape[-1],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y + bias.astype(y.dtype)


def causal_conv_wcn(u_lm, kernel, bias, reverse=False):
    """u_lm: (L, d, b); depthwise causal conv along L in-place layout."""
    k = kernel.shape[0]
    kern = jnp.flip(kernel, axis=0) if reverse else kernel
    pad = [(0, k - 1)] if reverse else [(k - 1, 0)]
    y = jax.lax.conv_general_dilated(
        u_lm, kern.astype(u_lm.dtype), window_strides=(1,), padding=pad,
        feature_group_count=u_lm.shape[1],
        dimension_numbers=("WCN", "WIO", "WCN"))
    return y + bias.astype(y.dtype)[None, :, None]


def pipeline_A(u, ck, cb, wx, wdt, bdt, A, D):
    tsr = wdt.shape[0]
    n = A.shape[1]
    uc = jax.nn.silu(causal_conv_nwc(u, ck, cb))
    ssm = jnp.einsum("bld,dk->blk", uc, wx.astype(uc.dtype))
    dt, B, C = jnp.split(ssm, [tsr, tsr + n], axis=-1)
    dt = jax.nn.softplus(jnp.einsum("blt,td->bld", dt, wdt.astype(dt.dtype))
                         + bdt.astype(dt.dtype))
    return selective_scan_auto(uc, dt, A, B, C, D)


def pipeline_B(u, ck, cb, wx, wdt, bdt, A, D):
    tsr = wdt.shape[0]
    n = A.shape[1]
    u_lm = jnp.transpose(u, (1, 2, 0))                      # one transpose
    uc = jax.nn.silu(causal_conv_wcn(u_lm, ck, cb))
    ssm = jnp.einsum("ldb,dk->lkb", uc, wx.astype(uc.dtype))
    dt, B, C = jnp.split(ssm, [tsr, tsr + n], axis=1)
    dt = jax.nn.softplus(
        jnp.einsum("ltb,td->ldb", dt, wdt.astype(dt.dtype))
        + bdt.astype(dt.dtype)[None, :, None])
    return selective_scan_auto(uc, dt, A, B, C, D, True, 128,
                               False, True)


def pipeline_C(u, ck, cb, wx, wdt, bdt, A, D):
    tsr = wdt.shape[0]
    n = A.shape[1]
    uc = jax.nn.silu(causal_conv_nwc(u, ck, cb))
    uc = jnp.transpose(uc, (1, 2, 0))                       # one transpose
    ssm = jnp.einsum("ldb,dk->lkb", uc, wx.astype(uc.dtype))
    dt, B, C = jnp.split(ssm, [tsr, tsr + n], axis=1)
    dt = jax.nn.softplus(
        jnp.einsum("ltb,td->ldb", dt, wdt.astype(dt.dtype))
        + bdt.astype(dt.dtype)[None, :, None])
    return selective_scan_auto(uc, dt, A, B, C, D, True, 128,
                               False, True)


def run_shape(bt, L, d, h, dtype, grad=False, n=8):
    tsr = max(1, -(-h // 16))
    nst = 16
    rng = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rng.rand(*s).astype(np.float32) * 0.1,
                               dtype)
    u = f(bt, L, d)
    ck = f(4, 1, d)
    cb = f(d)
    wx = f(d, tsr + 2 * nst)
    wdt = f(tsr, d)
    bdt = f(d)
    A = -jnp.exp(jnp.asarray(rng.rand(d, nst).astype(np.float32)))
    D = jnp.ones((d,), jnp.float32)
    args = (u, ck, cb, wx, wdt, bdt, A, D)
    tag = f"({bt},{L},{d}) {np.dtype(dtype).name}" + (" grad" if grad else "")
    for name, fn in (("A batch-major+kernel-transposes", pipeline_A),
                     ("B lane-major end-to-end", pipeline_B),
                     ("C NWC conv + 1 transpose", pipeline_C)):
        try:
            bench(fn, args, n=n, label=f"{tag} {name}", grad=grad)
        except Exception as e:
            print(f"{tag} {name}: FAILED {str(e)[:160]}", flush=True)


def check_correctness():
    """B/C (lane-major IO) must match A (batch-major IO) numerically."""
    rng = np.random.RandomState(1)
    bt, L, d, h = 256, 81, 72, 144
    tsr, nst = -(-h // 16), 16
    f = lambda *s: jnp.asarray(rng.rand(*s).astype(np.float32) * 0.1)
    args = (f(bt, L, d), f(4, 1, d), f(d), f(d, tsr + 2 * nst),
            f(tsr, d), f(d),
            -jnp.exp(jnp.asarray(rng.rand(d, nst).astype(np.float32))),
            jnp.ones((d,), jnp.float32))
    ya = pipeline_A(*args)                                  # (b, L, d)
    yb = jnp.transpose(pipeline_B(*args), (2, 0, 1))
    yc = jnp.transpose(pipeline_C(*args), (2, 0, 1))
    for name, y in (("B", yb), ("C", yc)):
        err = float(jnp.max(jnp.abs(y - ya)))
        print(f"correctness {name} vs A: max abs diff {err:.2e}", flush=True)
        assert err < 1e-4, f"pipeline {name} diverges from A"


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    check_correctness()
    # serving shapes (bf16 fwd)
    run_shape(40960, 81, 72, 144, jnp.bfloat16)
    run_shape(40960, 49, 128, 256, jnp.bfloat16)
    # train shapes (fwd+bwd, bf16 activations)
    run_shape(10240, 81, 72, 144, jnp.bfloat16, grad=True, n=4)
    run_shape(4096, 49, 128, 256, jnp.bfloat16, grad=True, n=4)
