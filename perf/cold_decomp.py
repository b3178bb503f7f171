"""Cold-start decomposition (VERDICT r3 #6): where do the ~77 s of
fresh-process full-scene cold start go, now that the AOT executable
cache has removed compilation (executable deserialize measured 0.2 s)?

Phases timed from process start, in order, one fresh process:

  import        jax import (usually ~0: the axon sitecustomize preloads)
  backend       jax.devices() — tunnel dial + PJRT client init
  first_op      first trivial dispatch (runtime first-touch, program
                transfer path, device buffer alloc)
  model_init    jitted flax init of the flagship (persistent-cache hit
                or compile)
  scene_upload  host->device transfer of the Houston-sized scene
                (145 MB f32) — isolates the tunnel upload from the
                first band call
  cold_scene    full_scene_probabilities() first call (AOT executable
                cache load + band loop execution)
  warm_scene    second call over the resident scene (steady state, for
                reference against bench.py)

The irreducible floor on this backend = backend + first_op (tunnel
properties we cannot pre-warm from inside a fresh process); everything
else is ours. Reference pays zero compile/init in its loop
(/root/reference/model_utils.py:1067) but also never amortizes — the
comparison that matters is cold_scene vs its full per-scene wall.

Usage: timeout 2400 python perf/cold_decomp.py
"""
import os
import time

T0 = time.time()
MARKS = [("start", 0.0)]


def mark(name):
    MARKS.append((name, time.time() - T0))
    print("%-14s %8.2f s (cum)" % (name, MARKS[-1][1]), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vct_jax_cache"))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

mark("import")

jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.devices()
mark("backend")

_ = float(jnp.sum(jnp.ones((8, 8))))
mark("first_op")

import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from vit_cnn_tpu.infer.fullscene import full_scene_probabilities  # noqa: E402
from vit_cnn_tpu.models.mm_mamba import MultimodalityMamba  # noqa: E402

H, W, BANDS, CLASSES, PATCH = 349, 1905, 144, 15, 9
module = MultimodalityMamba(img_size=PATCH, in_channels1=BANDS,
                            in_channels2=1, dim_embedding=32,
                            n_classes=CLASSES)
key = jax.random.PRNGKey(0)
variables = jax.jit(module.init, static_argnames=("train",))(
    {"params": key, "dropout": key},
    jnp.zeros((2, PATCH, PATCH, BANDS), jnp.float32),
    jnp.zeros((2, PATCH, PATCH, 1), jnp.float32), train=False)
jax.block_until_ready(variables)
mark("model_init")

rng = np.random.RandomState(0)
img1 = rng.rand(H, W, BANDS).astype(np.float32)
img2 = rng.rand(H, W, 1).astype(np.float32)
d1 = jax.device_put(img1)
d2 = jax.device_put(img2)
_ = float(d1[0, 0, 0]) + float(d2[0, 0, 0])
mark("scene_upload")
del d1, d2

rows = int(os.environ.get("VCT_BENCH_ROWS", "4"))
wc = W - PATCH + 1
hp = {"patch_size": PATCH, "n_classes": CLASSES, "test_stride": 1,
      "bf16": "1"}
probs = full_scene_probabilities(module, variables, img1, img2, hp,
                                 chunk=rows * wc)
assert probs.shape == (H, W, CLASSES) and np.isfinite(probs).all()
mark("cold_scene")

probs = full_scene_probabilities(module, variables, img1, img2, hp,
                                 chunk=rows * wc)
mark("warm_scene")

print("\nphase deltas:")
for (_, a), (n, b) in zip(MARKS, MARKS[1:]):
    print("  %-14s %8.2f s" % (n, b - a))
floor = dict(MARKS).get("first_op", 0.0)
print("irreducible backend floor (backend init + first op): %.2f s"
      % floor)
