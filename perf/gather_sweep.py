"""Scene-window gather / prob-map scatter alternatives on the real TPU.

profile_flagship.py measured gather+identity+scatter at ~35 ms per
4096-window chunk — 190 MB of patch traffic that should cost ~1 ms at HBM
bandwidth. Suspect: the vmapped ``lax.dynamic_slice`` lowers to a serial
loop / per-window DMA. Variants:

  g0  current: vmap(dynamic_slice)               (infer/fullscene.py:43-59)
  g1  advanced indexing scene[rows+di, cols+dj]  (one 2-D gather HLO)
  g2  flat gather: scene.reshape(H*W,C)[flat + offset] (1-D gather, rows of
      C contiguous channels)
  s0  current scatter probs.at[cx, cy].add
  s1  flat scatter probs.reshape(H*W,K).at[center_flat].add
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, BANDS, CLASSES, PATCH = 349, 1905, 144, 15, 9
B = 4096


def bench(fn, *args, n=8, label=""):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(out))
    t0 = time.time()
    for _i in range(n):
        out = f(*args)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / n
    print("%-52s %8.2f ms" % (label, dt * 1e3), flush=True)
    return dt


rng = np.random.RandomState(0)
scene = jnp.asarray(rng.rand(H, W, BANDS).astype(np.float32))
from vit_cnn_tpu.infer.fullscene import sliding_window_origins  # noqa: E402

origins_np = sliding_window_origins(H, W, PATCH, 1)[:B]
origins = jnp.asarray(origins_np)
valid = jnp.ones(B, jnp.float32)
probs0 = jnp.zeros((H, W, CLASSES), jnp.float32)


def g0(scn, orig):
    def one(o):
        return jax.lax.dynamic_slice(scn, (o[0], o[1], 0),
                                     (PATCH, PATCH, BANDS))
    return jax.vmap(one)(orig)


di = jnp.arange(PATCH)


def g1(scn, orig):
    r = orig[:, 0, None, None] + di[None, :, None]
    c = orig[:, 1, None, None] + di[None, None, :]
    return scn[r, c]                                   # (B, P, P, C)


scene_flat = scene.reshape(H * W, BANDS)
off = (di[:, None] * W + di[None, :]).reshape(-1)      # (P*P,)


def g2(scn_flat, orig):
    flat = orig[:, 0] * W + orig[:, 1]
    idx = flat[:, None] + off[None, :]
    return jnp.take(scn_flat, idx, axis=0).reshape(B, PATCH, PATCH, BANDS)


fake_logits = jnp.asarray(rng.rand(B, CLASSES).astype(np.float32))


def s0(probs, orig, lg):
    cx = orig[:, 0] + PATCH // 2
    cy = orig[:, 1] + PATCH // 2
    return probs.at[cx, cy].add(lg)


def s1(probs, orig, lg):
    cf = (orig[:, 0] + PATCH // 2) * W + orig[:, 1] + PATCH // 2
    return probs.reshape(H * W, CLASSES).at[cf].add(
        lg).reshape(H, W, CLASSES)


def main():
    a = bench(g0, scene, origins, label="g0 vmap dynamic_slice")
    b = bench(g1, scene, origins, label="g1 advanced indexing 2d")
    c = bench(g2, scene_flat, origins, label="g2 flat 1d gather")
    bench(s0, probs0, origins, fake_logits, label="s0 scatter 2d .at[cx,cy]")
    bench(s1, probs0, origins, fake_logits, label="s1 scatter flat")
    # sanity: all gathers agree
    x0 = g0(scene, origins); x1 = g1(scene, origins)
    x2 = g2(scene_flat, origins)
    print("g1 == g0:", bool(jnp.allclose(x0, x1)),
          " g2 == g0:", bool(jnp.allclose(x0, x2)))


if __name__ == "__main__":
    main()
