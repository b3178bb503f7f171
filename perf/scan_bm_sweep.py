"""Can the stage2 scan's (b,L,ch) <-> (L,ch,b) HBM transposes be replaced
by in-kernel VMEM transposes? The lane-major kernel (ops/selective_scan.py)
is fed by XLA transposes that cost ~9.5 ms end-to-end at the stage2 shape
(ROOFLINE.md: 31.3 ms end-to-end vs 21.8 kernel-only) while stage1's are
free (fused). This sweep times a BATCH-MAJOR-IO variant: blocks arrive as
(bb, L, ch) straight from the mixer layout, the kernel transposes each
block to the lane-major compute layout inside VMEM, and transposes y back
on store — no XLA transpose in the graph at all.

Usage: python perf/scan_bm_sweep.py   (TPU, ~3 min)
"""
import functools
import importlib
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

ss = importlib.import_module("vit_cnn_tpu.ops.selective_scan")


def _scan_kernel_bm(u_ref, dt_ref, At_ref, b_ref, c_ref, d_ref, y_ref,
                    time_chunk: int = 8):
    """Batch-major IO: refs are (bb, L, ch); compute in (n, d, bb)."""
    bb, L, d = u_ref.shape
    n = b_ref.shape[-1]
    At = At_ref[...].astype(jnp.float32)
    Dv = d_ref[...].astype(jnp.float32)

    tp = lambda x: jnp.transpose(x, (1, 2, 0))
    u = tp(u_ref[...]).astype(jnp.float32)         # (L, d, bb)
    dt = tp(dt_ref[...]).astype(jnp.float32)
    B = tp(b_ref[...]).astype(jnp.float32)         # (L, n, bb)
    C = tp(c_ref[...]).astype(jnp.float32)

    h = jnp.zeros((n, d, bb), jnp.float32)
    n_chunks = (L + time_chunk - 1) // time_chunk
    ys = []
    for c in range(n_chunks):
        t0 = c * time_chunk
        tc = min(time_chunk, L - t0)
        dt_c = dt[t0:t0 + tc]
        u_c = u[t0:t0 + tc]
        B_c = B[t0:t0 + tc]
        C_c = C[t0:t0 + tc]
        dA_c = jnp.exp(dt_c[:, None] * At[None, :, :, None])
        dBu_c = (dt_c * u_c)[:, None] * B_c[:, :, None, :]
        hs = [None] * tc
        for t in range(tc):
            h = dA_c[t] * h + dBu_c[t]
            hs[t] = h
        H_c = jnp.stack(hs, axis=0)
        y_c = jnp.sum(C_c[:, :, None, :] * H_c, axis=1) \
            + Dv[..., None] * u_c
        ys.append(y_c)
    y = jnp.concatenate(ys, axis=0)                # (L, d, bb)
    y_ref[...] = jnp.transpose(y, (2, 0, 1)).astype(y_ref.dtype)


def scan_bm(u, dt, A, B, C, D, block_b=128):
    A = A.astype(jnp.float32)
    D = D.astype(jnp.float32)
    b, L, d = u.shape
    n = A.shape[-1]
    assert b % block_b == 0
    spec = lambda ch: pl.BlockSpec((block_b, L, ch), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _scan_kernel_bm,
        grid=(b // block_b,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            spec(d), spec(d),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            spec(n), spec(n),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=spec(d),
        out_shape=jax.ShapeDtypeStruct((b, L, d), u.dtype),
    )(u, dt, A.T, B, C, D[None])


def fence(x):
    return float(jnp.sum(x))


def bench(f, *args, iters=16, label=""):
    y = f(*args)
    fence(y)
    t0 = time.time()
    for _ in range(iters):
        y = f(*args)
    fence(y)
    ms = (time.time() - t0) / iters * 1000
    print(f"{label}: {ms:.1f} ms", flush=True)
    return ms


if __name__ == "__main__":
    for (b, L, d, n, tag) in [(40960, 81, 72, 16, "stage1"),
                              (40960, 49, 128, 16, "stage2")]:
        key = jax.random.PRNGKey(0)
        u = jax.random.normal(key, (b, L, d), jnp.float32)
        dt = jax.nn.softplus(jax.random.normal(key, (b, L, d)) - 1)
        A = -jnp.abs(jax.random.normal(key, (d, n)))
        B = jax.random.normal(key, (b, L, n))
        C = jax.random.normal(key, (b, L, n))
        D = jnp.ones((d,))
        try:
            bench(jax.jit(scan_bm), u, dt, A, B, C, D,
                  label=f"{tag} ({b},{L},{d}) batch-major-io")
        except Exception as e:
            print(f"{tag} bm FAIL: {str(e)[:150]}", flush=True)
        bench(jax.jit(functools.partial(ss.selective_scan_pallas)),
              u, dt, A, B, C, D, label=f"{tag} lane-major-io (current)")
