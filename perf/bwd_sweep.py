"""Sweep (time_chunk, block_b) for the BACKWARD scan kernel at the
flagship's widened training shapes. The lane-major rewrite (bb=128 on
lanes) made the forward 3.9x faster but the backward holds ~5 (Tc,n,d,bb)
f32 temporaries per chunk across two sweeps, and Mosaic does not reuse
scoped buffers across the statically-unrolled chunk iterations -> VMEM
overflow at (Tc=8, bb=128, d=128): 204M of 128M (bench.py train step,
2026-08-16). Finds the fastest fitting config per stage.

Usage: python perf/bwd_sweep.py   (TPU; ~3 min)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import importlib

ss = importlib.import_module("vit_cnn_tpu.ops.selective_scan")


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def bench_bwd(b, L, d, n, time_chunk, block_b, iters=8):
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (b, L, d), jnp.float32)
    dt = jax.nn.softplus(jax.random.normal(key, (b, L, d)) - 1)
    A = -jnp.abs(jax.random.normal(key, (d, n)))
    B = jax.random.normal(key, (b, L, n))
    C = jax.random.normal(key, (b, L, n))
    D = jnp.ones((d,))
    g = jax.random.normal(key, (b, L, d))

    f = jax.jit(functools.partial(ss._pallas_backward, block_b=block_b))
    # monkeypatch chunk size through the module global for the sweep
    old = ss._scan_bwd_kernel
    ss._scan_bwd_kernel = functools.partial(old, time_chunk=time_chunk)
    try:
        outs = f(u, dt, A, B, C, D, g)
        fence(outs)
        t0 = time.time()
        for _ in range(iters):
            outs = f(u, dt, A, B, C, D, g)
        fence(outs)
        ms = (time.time() - t0) / iters * 1000
        print(f"bwd (b={b}, L={L}, d={d}) Tc={time_chunk} bb={block_b}: "
              f"{ms:.1f} ms", flush=True)
        return ms
    except Exception as e:
        msg = str(e)
        if "vmem" in msg.lower() or "memory" in msg.lower():
            print(f"bwd (b={b}, L={L}, d={d}) Tc={time_chunk} "
                  f"bb={block_b}: OOM", flush=True)
        else:
            print(f"bwd (b={b}, L={L}, d={d}) Tc={time_chunk} "
                  f"bb={block_b}: FAIL {msg[:120]}", flush=True)
        return None
    finally:
        ss._scan_bwd_kernel = old


if __name__ == "__main__":
    for (b, L, d, n) in [(10240, 81, 72, 16),     # stage1, train batch 1024
                         (4096, 49, 128, 16)]:    # stage2
        for tc, bb in [(8, 128), (4, 128), (2, 128), (8, 64), (4, 64),
                       (16, 32)]:
            bench_bwd(b, L, d, n, tc, bb)
