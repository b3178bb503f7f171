"""Benchmark: Houston2013-scale full-scene inference throughput on the
flagship model (Multimodality_Mamba, patch 9), in patches/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "patches/sec/chip", "vs_baseline": N}

``vs_baseline`` compares against the reference's architecture bottleneck —
the per-window Python sliding-window generator + batched torch-CPU forward
(ref: model_utils.py:1067-1132) — measured here on the same host with an
equivalent torch model over the same scene and cached in
``bench_baseline.json``. All diagnostics go to stderr; stdout carries only
the JSON line.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: the flagship bf16 program takes ~10 min to
# build through a remote-compile backend; cache it across bench runs
os.makedirs(os.path.expanduser("~/.cache/vct_jax_cache"), exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vct_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

H, W, BANDS, CLASSES, PATCH = 349, 1905, 144, 15, 9
CHUNK = 4096
BENCH_CHUNKS = 32          # patches measured = CHUNK * BENCH_CHUNKS
BASELINE_FILE = os.path.join(os.path.dirname(__file__),
                             "bench_baseline.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synthetic_scene():
    rng = np.random.RandomState(0)
    img1 = rng.rand(H, W, BANDS).astype(np.float32)
    img2 = rng.rand(H, W, 1).astype(np.float32)
    return img1, img2


def measure_ours(img1, img2):
    import jax
    import jax.numpy as jnp

    from vit_cnn_tpu.infer.fullscene import (_bf16_cached, _chunk_scatter,
                                             sliding_window_origins)
    from vit_cnn_tpu.models.mm_mamba import MultimodalityMamba

    module = MultimodalityMamba(img_size=PATCH, in_channels1=BANDS,
                                in_channels2=1, dim_embedding=32,
                                n_classes=CLASSES)
    key = jax.random.PRNGKey(0)
    dummy1 = jnp.zeros((2, PATCH, PATCH, BANDS), jnp.float32)
    dummy2 = jnp.zeros((2, PATCH, PATCH, 1), jnp.float32)
    variables = module.init({"params": key, "dropout": key}, dummy1, dummy2,
                            train=False)

    scene1 = jnp.asarray(img1)
    scene2 = jnp.asarray(img2)
    probs = jnp.zeros((H, W, CLASSES), jnp.float32)
    origins = sliding_window_origins(H, W, PATCH, 1)
    log("total windows:", len(origins))

    # serving config: bf16 forward, f32 scatter-add accumulation
    # (VCT_BENCH_BF16=0 opts out)
    apply_fn = module.apply
    if os.environ.get("VCT_BENCH_BF16", "1") != "0":
        apply_fn = _bf16_cached(module.apply)

    def run_chunk(probs, i):
        o = jnp.asarray(origins[i:i + CHUNK])
        v = jnp.ones(len(o), jnp.float32)
        return _chunk_scatter(probs, scene1, scene2, o, v, variables,
                              patch_size=PATCH, apply_fn=apply_fn)

    def materialize(x):
        # NOTE: on the tunneled TPU backend block_until_ready() returns
        # before execution finishes; a host transfer is the only reliable
        # completion barrier, so timing fences on fetching a scalar.
        return float(jnp.sum(x))

    # warmup/compile
    t0 = time.time()
    probs = run_chunk(probs, 0)
    materialize(probs)
    log("compile+first chunk: {:.1f}s".format(time.time() - t0))

    t0 = time.time()
    for k in range(1, 1 + BENCH_CHUNKS):
        probs = run_chunk(probs, k * CHUNK)
    materialize(probs)
    dt = time.time() - t0
    rate = BENCH_CHUNKS * CHUNK / dt
    log("ours: {:.0f} patches/sec/chip ({} chunks in {:.2f}s)".format(
        rate, BENCH_CHUNKS, dt))
    return rate


def measure_torch_baseline(img1, img2, budget_s=30.0):
    """Reference-style hot loop: Python per-window generator, list-of-views
    batching, torch CPU forward, center-pixel accumulate
    (ref: model_utils.py:1067-1132).

    The stand-in model is FLOPs-MATCHED to the flagship (~300 MFLOP/patch,
    measured via XLA cost analysis) using cuDNN/oneDNN-friendly dense convs
    — a conservative baseline: the real Multimodality_Mamba on torch CPU
    (10-direction HF MambaMixer slow path) is far slower per FLOP."""
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            cached = json.load(f)
        log("baseline (cached):", cached)
        return cached["patches_per_sec"]

    import itertools

    import torch
    import torch.nn as tnn

    class MatchedCNN(tnn.Module):
        # ~300 MFLOP per 9x9 patch: 81*(145*256 + 256*256*9 + 256*256*9)*2
        def __init__(self):
            super().__init__()
            self.net = tnn.Sequential(
                tnn.Conv2d(BANDS + 1, 256, 1), tnn.BatchNorm2d(256),
                tnn.ReLU(), tnn.Conv2d(256, 256, 3, padding=1),
                tnn.BatchNorm2d(256), tnn.ReLU(),
                tnn.Conv2d(256, 256, 3, padding=1),
                tnn.BatchNorm2d(256), tnn.ReLU(),
                tnn.AdaptiveAvgPool2d(1), tnn.Flatten(),
                tnn.Linear(256, CLASSES))

        def forward(self, a, b):
            return self.net(torch.cat([a, b], 1))

    net = MatchedCNN().eval()
    probs = np.zeros((H, W, CLASSES), np.float32)

    def windows():
        for x in range(0, H - PATCH + 1):
            for y in range(0, W - PATCH + 1):
                yield (img1[x:x + PATCH, y:y + PATCH],
                       img2[x:x + PATCH, y:y + PATCH], x, y)

    def grouper(n, it):
        it = iter(it)
        while True:
            chunk = tuple(itertools.islice(it, n))
            if not chunk:
                return
            yield chunk

    done = 0
    t0 = time.time()
    with torch.no_grad():
        for batch in grouper(64, windows()):
            data = torch.from_numpy(
                np.copy([b[0] for b in batch]).transpose(0, 3, 1, 2))
            data2 = torch.from_numpy(
                np.copy([b[1] for b in batch]).transpose(0, 3, 1, 2))
            out = net(data, data2).numpy()
            for (x, y), o in zip([(b[2], b[3]) for b in batch], out):
                probs[x + PATCH // 2, y + PATCH // 2] += o
            done += len(batch)
            if time.time() - t0 > budget_s:
                break
    rate = done / (time.time() - t0)
    log("torch-CPU reference-style loop: {:.0f} patches/sec".format(rate))
    with open(BASELINE_FILE, "w") as f:
        json.dump({"patches_per_sec": rate, "model": "MatchedCNN",
                   "note": "reference-style python sliding-window loop, "
                           "torch CPU, FLOPs-matched (~300 MFLOP/patch) "
                           "conservative stand-in"}, f)
    return rate


def main():
    img1, img2 = synthetic_scene()
    ours = measure_ours(img1, img2)
    base = measure_torch_baseline(img1, img2)
    print(json.dumps({
        "metric": "houston2013_fullscene_flagship_inference",
        "value": round(ours, 1),
        "unit": "patches/sec/chip",
        "vs_baseline": round(ours / base, 2),
    }))


if __name__ == "__main__":
    main()
