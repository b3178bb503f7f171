"""Round-3 sweep: fused directional-stream kernels (ops/dirstream.py) vs
the round-2 one-hot-matmul + XLA-conv formulation, at flagship shapes.

D0  one-hot permute (bf16 MXU matmul) -> XLA causal conv (NWC) + SiLU
    -> transpose to lane-major  [round-2 path, per stream]
D1  dir_conv_silu: ONE kernel, one HBM read of u, all streams out
U0  inverse one-hot einsum with f32 accumulation [round-2]
U1  inv_perm_weighted_sum kernel

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 3600 python \
       perf/dirstream_sweep.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vit_cnn_tpu.ops.dirstream import (dir_conv_silu,
                                       dir_conv_silu_reference,
                                       inv_perm_weighted_sum,
                                       inv_perm_weighted_sum_reference)
from vit_cnn_tpu.ops.scan_paths import (base_paths, inverse_permutation)


def bench(fn, args, n=8, label=""):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _i in range(n):
        out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ms = (time.time() - t0) / n * 1e3
    print("%-56s %8.2f ms" % (label, ms), flush=True)
    return ms


def run(path_type, b, L, d, dtype=jnp.bfloat16):
    orders, bases, fwd_dir, rev_dir = base_paths(path_type, L)
    orders_t = tuple(tuple(int(v) for v in orders[i]) for i in bases)
    inv_t = tuple(tuple(int(v) for v in inverse_permutation(orders[i]))
                  for i in bases)
    rev_rows = tuple(i for i, r in enumerate(rev_dir) if r >= 0)
    nb, nr = len(bases), len(rev_rows)

    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.rand(b, L, d).astype(np.float32) * 0.1, dtype)
    cw = jnp.asarray(rng.rand(4, d).astype(np.float32) * 0.1, dtype)
    cb = jnp.asarray(rng.rand(d).astype(np.float32) * 0.1, dtype)
    tag = f"{path_type} ({b},{L},{d})"

    # --- correctness (vs reference formulation, on TPU) -----------------
    u_lm = jnp.transpose(u, (1, 2, 0))
    got_f, got_r = jax.jit(lambda x: dir_conv_silu(x, cw, cb, orders_t,
                                                   rev_rows))(u_lm)
    want_f, want_r = jax.jit(lambda x: dir_conv_silu_reference(
        x, cw, cb, orders_t, rev_rows))(u_lm)
    ef = float(jnp.max(jnp.abs(got_f.astype(jnp.float32)
                               - want_f.astype(jnp.float32))))
    er = float(jnp.max(jnp.abs(got_r.astype(jnp.float32)
                               - want_r.astype(jnp.float32))))
    print(f"{tag} dir_conv_silu correctness: fwd {ef:.2e} rev {er:.2e}",
          flush=True)
    assert ef < 2e-2 and er < 2e-2

    yf = jnp.asarray(rng.rand(nb, L, d, b).astype(np.float32) * 0.1, dtype)
    yr = jnp.asarray(rng.rand(nr, L, d, b).astype(np.float32) * 0.1, dtype)
    wf = jnp.asarray(rng.rand(nb).astype(np.float32))
    wr = jnp.asarray(rng.rand(nr).astype(np.float32))
    got = jax.jit(lambda a, c: inv_perm_weighted_sum(a, c, wf, wr, inv_t,
                                                     rev_rows))(yf, yr)
    want = jax.jit(lambda a, c: inv_perm_weighted_sum_reference(
        a, c, inv_t, rev_rows, wf, wr))(yf, yr)
    ei = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                               - want.astype(jnp.float32))))
    print(f"{tag} inv_perm_weighted_sum correctness: {ei:.2e}", flush=True)
    assert ei < 2e-2

    # --- D0: one-hot permute + XLA conv + transpose ----------------------
    perms = jnp.asarray(np.stack([orders[i] for i in bases]))

    def d0(u):
        P = jax.nn.one_hot(perms, L, dtype=u.dtype)
        ug = jnp.einsum("nls,bsc->nblc", P, u).reshape(nb * b, L, d)
        k = 4
        kern = jnp.tile(cw[:, None, :], (1, 1, 1))
        y = jax.lax.conv_general_dilated(
            ug, cw[:, None, :], (1,), [(k - 1, 0)],
            feature_group_count=d, dimension_numbers=("NWC", "WIO", "NWC"))
        y = jax.nn.silu(y + cb)
        return jnp.moveaxis(y.reshape(nb, b, L, d), 1, 3)   # lane-major 4D

    bench(d0, (u,), label=f"{tag} D0 one-hot+conv+silu+to-lane")
    bench(lambda x: dir_conv_silu(x, cw, cb, orders_t, rev_rows), (u_lm,),
          label=f"{tag} D1 fused dir_conv_silu (fwd+rev)")

    def u0(yf):
        inv = jnp.asarray(np.stack([np.asarray(i) for i in inv_t]))
        Pi = jax.nn.one_hot(inv, L, dtype=yf.dtype)
        yb = jnp.moveaxis(yf, 3, 1)                         # (nb, b, L, d)
        comb = yb * wf.astype(yf.dtype)[:, None, None, None]
        return jnp.einsum("nls,nbsc->blc", Pi, comb,
                          preferred_element_type=jnp.float32
                          ).astype(yf.dtype)

    bench(u0, (yf,), label=f"{tag} U0 one-hot inverse einsum (fwd only)")
    bench(lambda a, c: inv_perm_weighted_sum(a, c, wf, wr, inv_t, rev_rows),
          (yf, yr), label=f"{tag} U1 fused inv_perm_weighted_sum")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run("81_2+8", 4096, 81, 72)
    run("49_2+8", 4096, 49, 128)
