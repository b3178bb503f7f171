"""Tunnel transfer probe: measures host->device upload bandwidth (f32 vs
bf16), device->host download, and whether async dispatch overlaps
transfers with compute through the tunneled TPU backend. Informs the
slab-pipelined serving design (ROOFLINE round-3).

Usage: timeout 900 python perf/transfer_probe.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vct_jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

H, W, BANDS = 349, 1905, 144


def fence(x):
    return float(jnp.sum(x[..., 0].astype(jnp.float32)))


def timed(label, f, n=3):
    f()                                    # warm (alloc paths, cache)
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    print("%-44s %7.2f s  (min %.2f)" % (label, np.mean(ts), min(ts)),
          flush=True)
    return min(ts)


def main():
    rng = np.random.RandomState(0)
    scene_f32 = rng.rand(H, W, BANDS).astype(np.float32)
    scene_bf16 = scene_f32.astype(ml_dtypes.bfloat16)
    nbytes = scene_f32.nbytes / 1e6
    print(f"scene: {nbytes:.0f} MB f32, {nbytes/2:.0f} MB bf16", flush=True)

    t_cast = timed("host cast f32->bf16 (np/ml_dtypes)",
                   lambda: scene_f32.astype(ml_dtypes.bfloat16))

    def up_f32():
        d = jax.device_put(scene_f32)
        fence(d)

    def up_bf16():
        d = jax.device_put(scene_bf16)
        fence(d)

    t_f32 = timed("upload f32 (device_put + fence)", up_f32)
    t_bf16 = timed("upload bf16", up_bf16)
    print("  -> f32 %.0f MB/s | bf16 %.0f MB/s" %
          (nbytes / t_f32, nbytes / 2 / t_bf16), flush=True)

    big = jax.device_put(rng.rand(349, 1905, 15).astype(np.float32))
    fence(big)
    timed("download 40 MB f32 (np.asarray)", lambda: np.asarray(big))

    # ---- overlap: does a compute program run while the NEXT slab
    # uploads? Matmul sized to ~2s of MXU work. --------------------------
    a = jax.device_put(rng.rand(8192, 8192).astype(np.float32))
    fence(a)

    @jax.jit
    def burn(x):
        def body(_, y):
            return y @ y / jnp.float32(90.5)
        return jax.lax.fori_loop(0, 24, body, x)

    fence(burn(a))                          # compile
    t_burn = timed("compute burn alone", lambda: fence(burn(a)))

    def seq():
        fence(burn(a))
        d = jax.device_put(scene_bf16)
        fence(d)

    def pipelined():
        out = burn(a)                       # async dispatch
        d = jax.device_put(scene_bf16)      # upload while it runs?
        fence(d)
        fence(out)

    t_seq = timed("burn THEN upload bf16 (sequential)", seq)
    t_pipe = timed("burn + upload bf16 (pipelined)", pipelined)
    print("  -> overlap saves %.2f s of %.2f (ideal %.2f)" %
          (t_seq - t_pipe, t_seq, max(t_burn, t_bf16)), flush=True)

    # ---- does DOWNLOAD of result s overlap compute of s+1? -------------
    def down_seq():
        o1 = burn(a)
        fence(o1)
        _ = np.asarray(big)

    def down_pipe():
        o1 = burn(a)
        _ = np.asarray(big)                 # download while burn runs?
        fence(o1)

    timed("burn THEN download 40MB", down_seq)
    timed("burn + download 40MB (pipelined)", down_pipe)


if __name__ == "__main__":
    main()
