"""Fine-grained deltas for the NON-scan "rest" of the multidir mixer lane
path (round 5 follow-up to perf/mixer_phases.py: rest = 6.9-8.2 ms/layer
vs ~2-3 ms of traffic). Inline re-staging with transplanted params, exact
module parity asserted, nested `upto` programs so deltas cancel the
dispatch floor.

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 2400 python perf/mixer_rest_phases.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vct_jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import vit_cnn_tpu.nn.mamba as mam  # noqa: E402
from vit_cnn_tpu.nn.precision import bf16_apply, cast_floating  # noqa: E402
from vit_cnn_tpu.ops.dirstream import (dir_conv_silu,  # noqa: E402
                                       inv_perm_weighted_sum)

B = 4096
STAGES = [("stage1 (81 tok, h144, d72)", 81, 144, 72, "81_2+8"),
          ("stage2 (49 tok, h256, d128)", 49, 256, 128, "49_2+8")]


def bench(fn, x, label, n=16):
    f = jax.jit(lambda a: fn(a))
    out = f(x)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = f(x)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    ms = (time.time() - t0) / n * 1e3
    print("%-44s %8.3f ms" % (label, ms), flush=True)
    return ms


for label, L, hidden, d, ptype in STAGES:
    layer = mam.MultiDirMambaLayer(hidden_size=hidden,
                                   intermediate_size=d, path_type=ptype)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, hidden), jnp.bfloat16)
    v = jax.jit(layer.init)(key, x)
    p = cast_floating(v["params"], jnp.bfloat16)
    tsr = -(-hidden // 16)
    n_state = 16

    import math  # noqa: F401
    orders, bases, fwd_dir, rev_dir = mam.base_paths(ptype, L)
    rev_rows = [i for i, r in enumerate(rev_dir) if r >= 0]
    orders_t = tuple(tuple(int(vv) for vv in orders[i]) for i in bases)
    inv_t = tuple(tuple(int(vv) for vv in
                        mam.inverse_permutation(orders[i])) for i in bases)
    rr = tuple(rev_rows)
    n_static = len(orders)
    fwd_dir_all = list(fwd_dir)

    def staged(upto, _p=p):
        A = -jnp.exp(_p["A_log"].astype(jnp.float32))
        D = _p["D"].astype(jnp.float32)
        cw = _p["conv1d"]["kernel"][:, 0, :]
        cb = _p["conv1d"]["bias"]
        wk = {k: _p[k]["kernel"] for k in
              ("in_proj", "out_proj", "x_proj", "dt_proj")}
        dtb = _p["dt_proj"]["bias"]

        def f(h):
            proj = h @ wk["in_proj"]
            u, gate = jnp.split(proj, 2, axis=-1)
            u_lm = jnp.transpose(u, (1, 2, 0))
            if upto == "inproj":
                return u_lm + gate.sum() * 0
            uf, ur = dir_conv_silu(u_lm, cw, cb, orders_t, rr)
            if upto == "down":
                return uf[0] + ur[0] + gate.sum() * 0

            def ssm_inputs(uc):
                ssm = jnp.einsum("nlcb,cf->nlfb", uc, wk["x_proj"])
                dt, B_, C_ = jnp.split(ssm, [tsr, tsr + n_state], axis=-2)
                dt = jax.nn.softplus(
                    jnp.einsum("nlcb,cf->nlfb", dt, wk["dt_proj"])
                    + dtb[None, None, :, None])
                return dt, B_, C_

            dtf, Bf, Cf = ssm_inputs(uf)
            dtr, Br, Cr = ssm_inputs(ur)
            if upto == "ssm_inputs":
                return (dtf[0] + dtr[0]
                        + jnp.concatenate([Bf[0], Cf[0], Br[0], Cr[0]],
                                          axis=-2).sum() * 0
                        + gate.sum() * 0)
            y_fwd = mam.selective_scan_auto(uf, dtf, A, Bf, Cf, D,
                                            use_pallas=True,
                                            lane_major_io=True)
            y_rev = mam.selective_scan_auto(ur, dtr, A, Br, Cr, D,
                                            use_pallas=True, reverse=True,
                                            lane_major_io=True)
            if upto == "scans":
                return y_fwd[0] + y_rev[0] + gate.sum() * 0
            w = jax.nn.softmax(_p["direction_gate"].astype(jnp.float32)
                               ).astype(y_fwd.dtype)
            wf = w[jnp.asarray(fwd_dir_all)]
            wr = w[jnp.asarray([rev_dir[i] for i in rev_rows])]
            y = inv_perm_weighted_sum(y_fwd, y_rev, wf, wr, inv_t, rr)
            y = jnp.transpose(y, (2, 0, 1))
            if upto == "up":
                return y + gate.sum() * 0
            y = y * jax.nn.silu(gate)
            return y @ wk["out_proj"]
        return f

    print(f"--- {label}")
    apply_bf16 = bf16_apply(layer.apply)
    mod = bench(lambda a: apply_bf16(v, a), x, "module (lane path)")
    got = jax.jit(staged("full"))(x)
    want = jax.jit(lambda a: apply_bf16(v, a))(x)
    diff = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                 - want.astype(jnp.float32))))
    print(f"staged-vs-module max|diff| = {diff:.2e}")
    ts, prev = {}, 0.0
    for name in ("inproj", "down", "ssm_inputs", "scans", "up", "full"):
        ts[name] = bench(staged(name), x, f"upto {name}")
    print("phase deltas:")
    prev = 0.0
    for name in ("inproj", "down", "ssm_inputs", "scans", "up", "full"):
        print("  %-14s %7.3f ms" % (name, ts[name] - prev))
        prev = ts[name]
