"""Compositional phase deltas for the MHST _HSIEncoder at the serving
shape (B=4096, patch 8, 144 bands, bf16) — profile_mhst.py r5 measured it
at 24.3 ms, second only to attention. Same nested-program method as
mhst_block_phases.py (per-dispatch overhead cancels in deltas).

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 1800 python perf/mhst_encoder_phases.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vct_jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from vit_cnn_tpu.models.mhst import _HSIEncoder  # noqa: E402
from vit_cnn_tpu.nn.precision import bf16_apply  # noqa: E402

B, P, BANDS = 4096, 8, 144
key = jax.random.PRNGKey(0)
hsi = jax.random.normal(key, (B, P, P, BANDS))

enc = _HSIEncoder()
v = jax.jit(enc.init, static_argnames=("train",))(key, hsi[:2], train=False)
eb = bf16_apply(enc.apply)


class Stop(Exception):
    pass


def staged(upto):
    """Run the encoder but truncate after the named conv stage by
    monkeypatching flax interception — simpler: re-express the stages
    inline with the trained params."""
    params = v["params"]
    bs = v.get("batch_stats", {})

    def bn(name, x):
        sc = params[name]["bn"]["scale"].astype(jnp.bfloat16)
        bi = params[name]["bn"]["bias"].astype(jnp.bfloat16)
        mu = bs[name]["bn"]["mean"].astype(jnp.bfloat16)
        var = bs[name]["bn"]["var"].astype(jnp.bfloat16)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * sc + bi

    def conv3d(name, x, strides=(1, 1, 1), padding=None, k=None):
        w = params[name]["kernel"].astype(jnp.bfloat16)
        b_ = params[name]["bias"].astype(jnp.bfloat16)
        kd = w.shape[0]
        if padding is None:
            padding = [(kd // 2, kd // 2), (w.shape[1] // 2, w.shape[1] // 2),
                       (w.shape[2] // 2, w.shape[2] // 2)]
        y = jax.lax.conv_general_dilated(
            x, w, strides, padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + b_

    def f(h):
        h = h.astype(jnp.bfloat16)
        x = h.transpose(0, 3, 1, 2)[..., None]
        x = conv3d("conv1", x, (3, 1, 1), [(5, 5), (1, 1), (1, 1)])
        x = jax.nn.relu(bn("bn1", x))
        if upto == "conv1":
            return x
        br = [conv3d(f"conv2_{i + 1}", x, (1, 1, 1),
                     [(kk // 2, kk // 2), (0, 0), (0, 0)])
              for i, kk in enumerate((1, 3, 5, 11))]
        x = jnp.concatenate(br, axis=-1)
        x = jax.nn.relu(bn("bn2", x))
        if upto == "inception":
            return x
        x = conv3d("conv3", x)
        x = jax.nn.relu(bn("bn3", x))
        if upto == "conv3":
            return x
        b, d = x.shape[0], x.shape[1]
        x = x.transpose(0, 2, 3, 4, 1).reshape(b, P, P, 16 * d)
        # PyConv4 (3/5/7/9, groups 1/2/4/8) via the module itself
        from vit_cnn_tpu.nn.pyconv import PyConv

        pc = PyConv(64, (3, 5, 7, 9), (4, 4, 4, 4), (1, 2, 4, 8))
        y = pc.apply({"params": params["conv4"]}, x).astype(jnp.bfloat16)
        if upto == "pyconv":
            return y
        y = jax.nn.relu(bn("bn4", y))
        w5 = params["conv5"]["kernel"].astype(jnp.bfloat16)
        b5 = params["conv5"]["bias"].astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            y, w5, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b5
        y = jax.nn.relu(bn("bn5", y))
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return f


def bench(fn, label, n=16):
    f = jax.jit(fn)
    out = f(hsi)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = f(hsi)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    ms = (time.time() - t0) / n * 1e3
    print("%-40s %8.3f ms" % (label, ms), flush=True)
    return ms


full_mod = bench(lambda a: eb(v, a, train=False), "module (reference impl)")
ts = {}
for name in ("conv1", "inception", "conv3", "pyconv", "full"):
    ts[name] = bench(staged(name), f"upto {name}")
got = float(jnp.max(jnp.abs(
    jax.jit(staged("full"))(hsi).astype(jnp.float32)
    - jax.jit(lambda a: eb(v, a, train=False))(hsi).astype(jnp.float32))))
print(f"staged-vs-module max|diff| = {got:.2e}")
print("\nphase deltas:")
prev = 0.0
for name in ("conv1", "inception", "conv3", "pyconv", "full"):
    print("  %-22s %7.3f ms" % (name, ts[name] - prev))
    prev = ts[name]
