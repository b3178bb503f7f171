"""Fused dirstream ADJOINT kernels: real-TPU compile + numerics + timing.

The forward fused kernels (dir_conv_silu / inv_perm_weighted_sum) are
hardware-verified; the round-3 adjoints are interpret-mode-verified only
and default OFF (VCT_DIRSTREAM_FUSED_BWD). This gate compiles them on the
real chip at flagship-like shapes, checks the gradients against jax.vjp
of the reference formulation, and times a full grad step both ways.
Flip the default only after this passes.

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 1800 python perf/dirstream_bwd_check.py
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

from vit_cnn_tpu.ops.dirstream import (dir_conv_silu,  # noqa: E402
                                       inv_perm_weighted_sum)

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

if os.environ.get("VCT_CHECK_INTERPRET") == "1":
    # CPU wiring smoke: the axon sitecustomize pins jax_platforms via
    # config (env JAX_PLATFORMS=cpu alone is ignored), and with the
    # tunnel down backend init HANGS rather than erroring — pin CPU the
    # way tests/conftest.py does
    jax.config.update("jax_platforms", "cpu")

# flagship-mixer-like shape: L tokens, d channels, B batch (lane-major);
# override via VCT_CHECK_SHAPE="side,D,B" for a CPU interpret-mode smoke
_shape = os.environ.get("VCT_CHECK_SHAPE", "9,128,1024")
side, D, B = (int(t) for t in _shape.split(","))
L, K = side * side, 4
grid = np.arange(L).reshape(side, side)
ORDERS = (tuple(int(v) for v in grid.reshape(-1)),            # row-major
          tuple(int(v) for v in grid.T.reshape(-1)))          # col-major
REV_ROWS = (1,)
INV = tuple(tuple(int(np.argsort(np.asarray(o))[t]) for t in range(L))
            for o in ORDERS)


def loss(u, cw, cb, wf, wr):
    uf, ur = dir_conv_silu(u, cw, cb, ORDERS, REV_ROWS)
    # stand-in for the scan: any elementwise map keeps the adjoint
    # shapes/dataflow identical to the train step's
    yf = uf * 1.5
    yr = ur * 0.5
    y = inv_perm_weighted_sum(yf, yr, wf, wr, INV, REV_ROWS)
    return jnp.sum(y.astype(jnp.float32) ** 2)


def grads_and_time(tag):
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    u = jax.random.normal(ks[0], (L, D, B), jnp.bfloat16)
    cw = jax.random.normal(ks[1], (K, D), jnp.bfloat16) * 0.5
    cb = jax.random.normal(ks[2], (D,), jnp.bfloat16) * 0.1
    wf = jax.random.normal(ks[3], (len(ORDERS),), jnp.bfloat16)
    wr = jax.random.normal(ks[4], (len(REV_ROWS),), jnp.bfloat16)
    out = g(u, cw, cb, wf, wr)
    jax.block_until_ready(out)
    t0 = time.time()
    n = 20
    for _ in range(n):
        out = g(u, cw, cb, wf, wr)
    jax.block_until_ready(out)
    print("%-28s %8.3f ms/grad" % (tag, (time.time() - t0) / n * 1e3),
          flush=True)
    return [np.asarray(t, dtype=np.float32) for t in jax.tree_util.
            tree_leaves(out)]


os.environ["VCT_DIRSTREAM_FUSED_BWD"] = "0"
ref = grads_and_time("XLA vjp backward")
os.environ["VCT_DIRSTREAM_FUSED_BWD"] = "force"
if os.environ.get("VCT_CHECK_INTERPRET") == "1":
    # CPU wiring smoke (tiny shapes): run the Pallas adjoints under the
    # TPU interpreter; timing is meaningless there, only numerics count
    from jax.experimental import pallas as _pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = grads_and_time("fused Pallas adjoints (interp)")
else:
    got = grads_and_time("fused Pallas adjoints")

for r, g, name in zip(ref, got, ("du", "dcw", "dcb", "dwf", "dwr")):
    scale = max(1e-3, float(np.max(np.abs(r))))
    err = float(np.max(np.abs(r - g))) / scale
    print(f"{name}: rel max|diff| = {err:.2e}")
    assert np.isfinite(err) and err < 5e-2, f"{name} adjoint numerics off"
print("OK")
