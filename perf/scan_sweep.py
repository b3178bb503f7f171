"""Sweep of selective-scan kernel variants on the real TPU.

The round-1 kernel (ops/selective_scan.py) lays blocks out as
(bb=8, Tc, n, d): d rides the 128-lane axis (56% utilization at d=72) and
each grid cell's ops are tiny. Variants tested here:

  v0   current kernel, block_b in {8, 16, 32}
  v1   lane-major: arrays (L, d, bb) / (L, n, bb) with bb=128 sequences on
       the lane axis, d on sublanes (72 = 9x8 exact) - every elementwise op
       runs at full lane utilization; XLA-side transposes feed it
  v1t  same kernel, transposes timed separately (kernel-only cost)
  v2   v1 with time_chunk in {8, 27, 81}

Shapes mirror flagship stage 1 (40960, 81, 72) n=16 and stage 2
(40960, 49, 128). Run: PYTHONPATH=/root/.axon_site:/root/repo python
perf/scan_sweep.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_cnn_tpu.ops.selective_scan import selective_scan_pallas


def bench(fn, *args, n=8, label=""):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(out))
    t0 = time.time()
    for _i in range(n):
        out = f(*args)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / n
    print("%-48s %8.2f ms" % (label, dt * 1e3), flush=True)
    return dt


# ---------------------------------------------------------------------------
# v1: lane-major kernel. u,dt,y: (L, d, B); B,C: (L, n, B); state (n, d, bb).
# ---------------------------------------------------------------------------

def _kernel_lanemajor(u_ref, dt_ref, A_ref, b_ref, c_ref, d_ref, y_ref,
                      time_chunk: int, reverse: bool):
    L, d, bb = u_ref.shape
    n = b_ref.shape[1]
    A = A_ref[...].astype(jnp.float32)          # (n, d)
    Dv = d_ref[...].astype(jnp.float32)         # (1, d)

    h = jnp.zeros((n, d, bb), jnp.float32)
    n_chunks = (L + time_chunk - 1) // time_chunk
    order = range(n_chunks - 1, -1, -1) if reverse else range(n_chunks)
    for c in order:
        t0 = c * time_chunk
        tc = min(time_chunk, L - t0)
        dt_c = dt_ref[t0:t0 + tc].astype(jnp.float32)        # (tc, d, bb)
        u_c = u_ref[t0:t0 + tc].astype(jnp.float32)
        B_c = b_ref[t0:t0 + tc].astype(jnp.float32)          # (tc, n, bb)
        C_c = c_ref[t0:t0 + tc].astype(jnp.float32)
        dA_c = jnp.exp(dt_c[:, None] * A[None, :, :, None])  # (tc, n, d, bb)
        dBu_c = (dt_c * u_c)[:, None] * B_c[:, :, None, :]
        hs = [None] * tc
        steps = range(tc - 1, -1, -1) if reverse else range(tc)
        for t in steps:
            h = dA_c[t] * h + dBu_c[t]
            hs[t] = h
        H_c = jnp.stack(hs, axis=0)                          # (tc, n, d, bb)
        y_c = jnp.sum(C_c[:, :, None, :] * H_c, axis=1) \
            + Dv[..., None] * u_c
        y_ref[t0:t0 + tc] = y_c.astype(y_ref.dtype)


def scan_lanemajor_pre(u, dt, A, B, C, D, bb=128, tc=16, reverse=False):
    """Inputs already (L, d, BT) / (L, n, BT); returns (L, d, BT)."""
    L, d, bt = u.shape
    n = A.shape[-1]
    grid = (bt // bb,)
    spec = lambda ch: pl.BlockSpec((L, ch, bb), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)
    fix = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel_lanemajor, time_chunk=tc, reverse=reverse),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[spec(d), spec(d), fix((n, d)), spec(n), spec(n),
                  fix((1, d))],
        out_specs=spec(d),
        out_shape=jax.ShapeDtypeStruct((L, d, bt), u.dtype),
    )(u, dt, A.T, B, C, D[None])


def scan_lanemajor(u, dt, A, B, C, D, bb=128, tc=16, reverse=False):
    """(b, L, d) API: transposes around the lane-major kernel."""
    b = u.shape[0]
    pad = (-b) % bb
    if pad:
        z = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        u, dt, B, C = z(u), z(dt), z(B), z(C)
    tp = lambda x: jnp.transpose(x, (1, 2, 0))
    y = scan_lanemajor_pre(tp(u), tp(dt), A, tp(B), tp(C), D,
                           bb=bb, tc=tc, reverse=reverse)
    return jnp.transpose(y, (2, 0, 1))[:b]


def main():
    key = jax.random.PRNGKey(0)
    for (BT, L, d, n, tag) in [(40960, 81, 72, 16, "stage1"),
                               (40960, 49, 128, 16, "stage2")]:
        print(f"--- {tag}: ({BT}, {L}, {d}) n={n} ---", flush=True)
        ks = jax.random.split(key, 6)
        u = jax.random.normal(ks[0], (BT, L, d))
        dt = jax.nn.softplus(jax.random.normal(ks[1], (BT, L, d)))
        A = -jnp.abs(jax.random.normal(ks[2], (d, n)))
        Bm = jax.random.normal(ks[3], (BT, L, n))
        Cm = jax.random.normal(ks[4], (BT, L, n))
        D = jnp.ones((d,))

        for blk in (8, 16, 32):
            bench(lambda *a, _b=blk: selective_scan_pallas(*a, _b),
                  u, dt, A, Bm, Cm, D, label=f"v0 current blk{blk}")
        for tc in (8, 16, 27):
            bench(lambda *a, _t=tc: scan_lanemajor(*a, tc=_t),
                  u, dt, A, Bm, Cm, D, label=f"v1 lane-major tc{tc}")
        # kernel-only: inputs pre-transposed
        tp = lambda x: jnp.transpose(x, (1, 2, 0))
        uT, dtT, BT_, CT = (jax.jit(tp)(x) for x in (u, dt, Bm, Cm))
        for tc in (8, 16, 27):
            bench(lambda *a, _t=tc: scan_lanemajor_pre(*a, tc=_t),
                  uT, dtT, A, BT_, CT, D,
                  label=f"v1t kernel-only tc{tc}")
        # bf16 inputs (serving config)
        ub, dtb, Bb, Cb = (x.astype(jnp.bfloat16) for x in (u, dt, Bm, Cm))
        bench(lambda *a: selective_scan_pallas(*a, 8),
              ub, dtb, A, Bb, Cb, D, label="v0 bf16 blk8")
        bench(lambda *a: scan_lanemajor(*a, tc=16),
              ub, dtb, A, Bb, Cb, D, label="v1 bf16 tc16")


if __name__ == "__main__":
    main()
