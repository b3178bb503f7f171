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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vit_cnn_tpu.utils.envflags import bench_stamp  # noqa: E402

# persistent compile cache: the flagship bf16 program takes ~10 min to
# build through a remote-compile backend; cache it across bench runs
os.makedirs(os.path.expanduser("~/.cache/vct_jax_cache"), exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vct_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

H, W, BANDS, CLASSES, PATCH = 349, 1905, 144, 15, 9
BASELINE_FILE = os.path.join(os.path.dirname(__file__),
                             "bench_baseline.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def backend_or_die(timeout_s: int = 600):
    """Fail fast, loudly, if the backend cannot initialize.

    Through the tunneled TPU a dead backend makes the FIRST jax op hang
    in PJRT client init (observed: jax.devices() hung 360 s during the
    2026-08-17 outage) — without this guard the bench burns its whole
    driver timeout producing no diagnostic. The probe runs in a daemon
    thread (backend init is not interruptible); on timeout or error we
    print a one-line diagnosis to stderr and exit 1 immediately.
    timeout_s is generous because a healthy-but-queued tunnel can take
    ~70 s for a trivial op after remote-compile hammering."""
    import threading

    result = {}

    def probe():
        try:
            result["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # noqa: BLE001 — diagnostic path
            result["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in result:
        log("backend ready:", result["devices"])
        return
    log("FATAL: jax backend init {} after {}s — TPU tunnel down? "
        "(bench requires the real chip; no JSON emitted)".format(
            "error " + result["error"] if "error" in result
            else "still hung", timeout_s))
    os._exit(1)


def synthetic_scene():
    rng = np.random.RandomState(0)
    img1 = rng.rand(H, W, BANDS).astype(np.float32)
    img2 = rng.rand(H, W, 1).astype(np.float32)
    return img1, img2


def measure_ours(img1, img2):
    """Full-scene serving through the REAL entry point
    (infer.full_scene_probabilities, stride-1 row-band path): every band
    of the whole Houston-sized scene, gather->bf16 forward->f32
    accumulate->assembled (H, W, K) map fetched to host. Returns
    (patches/s/chip over the whole resident scene, cold_s, warm_fresh_s,
    warm_s): cold includes compilation from an empty process (AOT
    executable cache cuts it), warm_fresh is a repeat call with a NEW
    host scene (pays the tunnel upload), warm is a repeat over the
    device-resident scene — the honest end-to-end numbers VERDICT r2
    #5/#8 asked for, split by what a serving client actually pays."""
    import jax
    import jax.numpy as jnp

    from vit_cnn_tpu.infer.fullscene import full_scene_probabilities
    from vit_cnn_tpu.models.mm_mamba import MultimodalityMamba

    module = MultimodalityMamba(img_size=PATCH, in_channels1=BANDS,
                                in_channels2=1, dim_embedding=32,
                                n_classes=CLASSES)
    key = jax.random.PRNGKey(0)
    dummy1 = jnp.zeros((2, PATCH, PATCH, BANDS), jnp.float32)
    dummy2 = jnp.zeros((2, PATCH, PATCH, 1), jnp.float32)
    variables = jax.jit(module.init, static_argnames=("train",))(
        {"params": key, "dropout": key}, dummy1, dummy2, train=False)

    rows = int(os.environ.get("VCT_BENCH_ROWS", "4"))
    wc = W - PATCH + 1                       # 1897 windows per row
    n_windows = (H - PATCH + 1) * wc
    hp = {"patch_size": PATCH, "n_classes": CLASSES, "test_stride": 1,
          "bf16": os.environ.get("VCT_BENCH_BF16", "1") != "0"}
    log("total windows:", n_windows, "| band rows:", rows)

    def full_scene():
        # np.asarray inside = host transfer = completion fence (the
        # tunneled backend's block_until_ready does not block)
        return full_scene_probabilities(module, variables, img1, img2,
                                        hp, chunk=rows * wc)

    t0 = time.time()
    probs = full_scene()
    cold = time.time() - t0
    assert probs.shape == (H, W, CLASSES) and np.isfinite(probs).all()
    # warm, NEW scene: fresh host arrays defeat the device-resident scene
    # cache, so this wall includes the host->device upload (the honest
    # single-shot number for a scene never seen before)
    f1, f2 = img1.copy(), img2.copy()
    t0 = time.time()
    probs = full_scene_probabilities(module, variables, f1, f2,
                                     hp, chunk=rows * wc)
    warm_fresh = time.time() - t0
    # warm, RESIDENT scene: same host arrays -> cached device upload; one
    # program over all bands + the (H, W, K) result download. This is the
    # serving steady state (the reference's own loop re-tests the same
    # scene N_RUNS times, ref: main.py:377,500). Median of 3: the same
    # code measured 46.5k and 53.4k two hours apart in round 4 (±13%
    # single-shot spread, VERDICT r4 #5) — quote the median, carry the
    # band in the JSON.
    reps = int(os.environ.get("VCT_BENCH_REPS", "3"))
    warms = []
    for _ in range(reps):
        t0 = time.time()
        probs = full_scene()
        warms.append(time.time() - t0)
    warm = float(np.median(warms))
    rate = n_windows / warm
    # steady state: the same resident scene program with the result kept
    # ON DEVICE, fenced by a 1-float fetch — what a consumer that chains
    # on-device work pays per scene. warm - steady = map assembly + the
    # ~40 MB result download (VERDICT r3 #8: both headlines, one JSON)
    steadies = []
    for _ in range(reps):
        t0 = time.time()
        pd = full_scene_probabilities(module, variables, img1, img2, hp,
                                      chunk=rows * wc, out="device")
        _ = float(pd[0, 0, 0])           # host transfer = completion fence
        steadies.append(time.time() - t0)
    steady = float(np.median(steadies))
    log("ours: {:.0f} patches/sec/chip | full scene cold {:.1f}s "
        "warm fresh-scene {:.2f}s resident med {:.2f}s {} steady(device-out)"
        " med {:.2f}s {}".format(
            rate, cold, warm_fresh, warm,
            "[" + ",".join(f"{t:.2f}" for t in warms) + "]", steady,
            "[" + ",".join(f"{t:.2f}" for t in steadies) + "]"))
    flops = flagship_flops_per_patch(module, variables)
    return rate, cold, warm_fresh, warm, steady, warms, steadies, flops


def flagship_flops_per_patch(module, variables):
    """FLOPs per patch of the bf16 serving forward via XLA cost analysis
    (the TPU-native thop, ref: Mutimodality_Mamba7.py:1198-1199); None if
    the backend does not expose cost analysis."""
    import jax
    import jax.numpy as jnp

    try:
        b = 256
        d1 = jnp.zeros((b, PATCH, PATCH, BANDS), jnp.bfloat16)
        d2 = jnp.zeros((b, PATCH, PATCH, 1), jnp.bfloat16)
        fwd = jax.jit(lambda v, a, c: module.apply(v, a, c, train=False))
        cost = fwd.lower(variables, d1, d2).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) / b
        return flops or None
    except Exception as e:  # noqa: BLE001 — diagnostic-only path
        log("cost analysis unavailable:", repr(e)[:200])
        return None


def measure_train_ours(img1, img2, batch_size=None, budget_s=6.0):
    """Training throughput (patches/s/chip) of the flagship: gather +
    augment + fwd/bwd + AdamW update as ONE jitted program per batch
    (the reference's other hot loop, ref: model_utils.py:854-1045).

    batch_size 1024 saturates the chip; the reference's torch-CPU loop
    uses its default 64 (bigger batches do not help a CPU that is already
    compute-bound — measured in perf/measure_ref_baseline.py)."""
    import jax
    import jax.numpy as jnp

    from vit_cnn_tpu.models.registry import get_model
    from vit_cnn_tpu.pipeline.patches import AugmentConfig, PatchPipeline
    from vit_cnn_tpu.train.loop import Trainer

    if batch_size is None:
        batch_size = int(os.environ.get("VCT_TRAIN_BATCH", "1024"))
    rng = np.random.RandomState(0)
    gt = rng.randint(1, CLASSES, size=(H, W)).astype(np.int32)
    module, _, hp = get_model(
        "Multimodality_Mamba", dataset="Synthetic", n_classes=CLASSES,
        n_bands=(BANDS, 1), ignored_labels=[0], patch_size=PATCH,
        batch_size=batch_size, epoch=1, bf16=True, flip_augmentation=True)
    pipeline = PatchPipeline(
        img1, img2, gt, patch_size=PATCH, ignored_labels=[0],
        n_classes=CLASSES, augment=AugmentConfig(flip=True),
        supervision="full")
    trainer = Trainer(module, hp, pipeline, val_pipeline=None,
                      save_checkpoints=False)

    order = pipeline.epoch_order(trainer.np_rng)
    centers = jnp.asarray(order[:batch_size])
    valid = jnp.ones(batch_size, jnp.float32)

    def one_step():
        trainer.data_key, sub = jax.random.split(trainer.data_key)
        trainer.state, loss = trainer._step(trainer.state, centers,
                                            valid, sub, trainer._arrays,
                                            jnp.float32(0.0))
        return loss

    t0 = time.time()
    loss = one_step()
    _ = float(loss)  # host fetch = completion barrier (see materialize)
    log("train compile+first step: {:.1f}s".format(time.time() - t0))

    steps = 0
    t0 = time.time()
    while time.time() - t0 < budget_s:
        loss = one_step()
        steps += 1
    _ = float(loss)
    dt = time.time() - t0
    rate = steps * batch_size / dt
    log("ours train: {:.0f} patches/sec/chip ({} steps of {} in "
        "{:.2f}s, final loss {:.4f})".format(rate, steps, batch_size, dt,
                                             float(loss)))
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
    backend_or_die()
    img1, img2 = synthetic_scene()
    (ours, cold_s, warm_fresh_s, warm_s, steady_s, warms, steadies,
     flops_patch) = measure_ours(img1, img2)
    train_ours = measure_train_ours(img1, img2)
    base = measure_torch_baseline(img1, img2)

    # measured numbers for the ACTUAL reference flagship on torch CPU
    # (perf/measure_ref_baseline.py writes them into bench_baseline.json);
    # vs_baseline anchors on the real model when available, else the
    # FLOPs-matched stand-in
    ref = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            ref = json.load(f)
    infer_base = ref.get("reference_model_infer_patches_per_sec", base)
    train_base = ref.get("reference_model_train_patches_per_sec")

    # secondary metric (train throughput) rides stderr so stdout keeps the
    # single-JSON-line contract; the driver's tail records both
    log(json.dumps({
        "metric": "houston2013_flagship_train_step",
        "value": round(train_ours, 1),
        "unit": "patches/sec/chip",
        "vs_baseline": round(train_ours / train_base, 2)
        if train_base else None,
    }))
    print(json.dumps({
        "metric": "houston2013_fullscene_flagship_inference",
        "value": round(ours, 1),
        "unit": "patches/sec/chip",
        "vs_baseline": round(ours / infer_base, 2),
        "extra": {
            "train_patches_per_sec_chip": round(train_ours, 1),
            "train_vs_torch_cpu_reference": round(train_ours / train_base, 2)
            if train_base else None,
            "infer_vs_flops_matched_standin": round(ours / base, 2),
            "full_scene_windows": (H - PATCH + 1) * (W - PATCH + 1),
            "full_scene_s_cold": round(cold_s, 1),
            "full_scene_s_warm_fresh_scene": round(warm_fresh_s, 2),
            "full_scene_s_warm_resident": round(warm_s, 2),
            "full_scene_s_steady_device_out": round(steady_s, 2),
            "steady_state_patches_per_sec_chip":
                round((H - PATCH + 1) * (W - PATCH + 1) / steady_s, 1),
            "result_download_assembly_s": round(warm_s - steady_s, 2),
            # single-shot spread was ±13% in r4 (VERDICT r4 #5): the
            # headline quotes the median; min/max bound the band
            "resident_s_min_med_max": [round(min(warms), 2), round(warm_s, 2),
                                       round(max(warms), 2)],
            "steady_s_min_med_max": [round(min(steadies), 2),
                                     round(steady_s, 2),
                                     round(max(steadies), 2)],
            # chip-relative utilization (stretch, VERDICT r4 #7): the
            # flagship is VPU-bound (selective scan), so MFU vs the
            # 197 TFLOP/s v5e bf16 MXU peak is a floor, not the target
            "flops_per_patch": round(flops_patch, 0) if flops_patch
            else None,
            "mfu_vs_v5e_bf16_peak": round(
                ours * flops_patch / 197e12, 4) if flops_patch else None,
            "stamp": bench_stamp(),
        },
    }))


if __name__ == "__main__":
    main()
