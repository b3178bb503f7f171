"""In-context phase deltas for ONE flagship multidir mixer layer at both
stage shapes, by monkeypatching each Pallas stage to a same-shape
identity stand-in and differencing (round 5, closes VERDICT r4 #7's
stage2-transpose question with a measurement).

If the in-context scan delta ~= the scan kernel-only time from
perf/scan_sweep.py, the round-2 "stage2 transpose gap" (31.3 vs 21.8 ms
e2e-vs-kernel) is architecturally gone — the round-3 dirstream kernels
hand the scan its lane-major layout directly, and the only remaining
transposes ride the UNWIDENED (B, L, d) tensors (~51 MB bf16, ~0.25 ms
roofline each).

Usage: JAX_COMPILATION_CACHE_DIR=~/.cache/vct_jax_cache \
         timeout 2400 python perf/mixer_phases.py
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
import vit_cnn_tpu.ops.dirstream as ds  # noqa: E402

# nn.mamba binds selective_scan_auto at import time, so patch ITS name;
# the dirstream functions are imported inside __call__ (per-trace), so
# patching the ds module attributes works for those.
ss = mam

B = 4096
STAGES = [  # (label, L, hidden, intermediate) — flagship arch_zoo
    ("stage1 (81 tok, h144, d72)", 81, 144, 72),
    ("stage2 (49 tok, h256, d128)", 49, 256, 128),
]

real_scan = ss.selective_scan_auto
real_down = ds.dir_conv_silu
real_up = ds.inv_perm_weighted_sum


def bench(fn, x, label, n=16):
    # fresh lambda per bench: jax.jit on the SAME function object reuses
    # the trace cache, silently ignoring monkeypatched globals (the
    # ln_groups_probe lesson)
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


for label, L, hidden, inter in STAGES:
    layer = mam.MultiDirMambaLayer(hidden_size=hidden,
                                   intermediate_size=inter,
                                   path_type="81_2+8" if L == 81
                                   else "49_2+8")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, hidden), jnp.bfloat16)
    v = jax.jit(layer.init)(key, x)

    from vit_cnn_tpu.nn.precision import bf16_apply

    apply_bf16 = bf16_apply(layer.apply)

    def run(a, _v=v, _f=apply_bf16):
        # bf16 params, exactly like the serving path — the lane-major
        # fused pipeline only engages for bf16 activations
        return _f(_v, a)

    print(f"--- {label}")
    t_full = bench(run, x, "full layer")

    # stand-ins keep every operand alive (cheap adds) so XLA cannot
    # dead-code-eliminate the phases upstream of the one being removed
    def scan_standin(u, dt, A, Bm, Cm, D, **kw):
        if not kw.get("lane_major_io"):
            return real_scan(u, dt, A, Bm, Cm, D, **kw)
        z = u.dtype.type(0)
        return (u + z * dt[:, :, :1] + z * Bm[:, :, :1]
                + z * Cm[:, :, :1])

    ss.selective_scan_auto = scan_standin
    t_noscan = bench(run, x, "scan -> identity (deps kept)")
    ss.selective_scan_auto = real_scan

    def down_standin(u_lm, cw, cb, orders, rr, block_b=None):
        z = u_lm + (cw[0].astype(u_lm.dtype) * 0)[None, :, None]
        return (jnp.broadcast_to(z[None], (len(orders),) + u_lm.shape),
                jnp.broadcast_to(z[None], (len(rr),) + u_lm.shape))

    ds.dir_conv_silu = down_standin
    t_nodown = bench(run, x, "dirstream-down -> broadcast")
    ds.dir_conv_silu = real_down

    def up_standin(yf, yr, wf, wr, inv, rr, block_b=None):
        o = jnp.sum(yf, axis=0) + jnp.sum(wf).astype(yf.dtype) * 0
        if yr.shape[0]:
            o = o + jnp.sum(yr, axis=0) * jnp.sum(wr).astype(yf.dtype) * 0
        return o.astype(yf.dtype)

    ds.inv_perm_weighted_sum = up_standin
    t_noup = bench(run, x, "dirstream-up -> plain sum")
    ds.inv_perm_weighted_sum = real_up
    scans = t_full - t_noscan
    down = t_full - t_nodown
    up = t_full - t_noup
    print("  full %.3f = scans %.3f + dirstream-down %.3f + "
          "dirstream-up %.3f + rest(proj/transpose/gate) %.3f"
          % (t_full, scans, down, up, t_full - scans - down - up),
          flush=True)
