"""Measure the ACTUAL reference flagship (Multimodality_Mamba, torch CPU)
in the reference's own hot loops, to anchor bench.py's vs_baseline with a
measured number instead of the FLOPs-matched stand-in (VERDICT r1 weak #6):

* inference: the per-window Python sliding-window generator + batched
  forward + center-pixel accumulate (ref: model_utils.py:1067-1132),
* training: DataLoader(MultiModalX) batches through loss.backward() +
  optimizer.step() (ref: model_utils.py:905-935).

Writes both patches/s numbers into bench_baseline.json (merged with the
existing stand-in entry). Usage: python perf/measure_ref_baseline.py
(~3 min, torch CPU only — safe to run alongside nothing)."""

import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W, BANDS, CLASSES, PATCH = 349, 1905, 144, 15, 9
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "..",
                             "bench_baseline.json")


def main():
    import torch

    from ref_harness import load_reference, neutralize_cuda

    _, r_datasets, r_mu = load_reference()

    # the reference flagship hardcodes CUDA placements in forward
    # (Mutimodality_Mamba7.py:60) — map them to CPU for the whole
    # measurement (process exits at the end; no need to restore)
    neutralize_cuda().__enter__()

    rng = np.random.RandomState(0)
    img1 = rng.rand(64, 64, BANDS).astype(np.float32)   # loops never finish
    img2 = rng.rand(64, 64, 1).astype(np.float32)       # the scene; timed

    hp = {"dataset": "Synthetic", "n_classes": CLASSES,
          "n_bands": (BANDS, 1), "ignored_labels": [0],
          "flip_augmentation": False, "radiation_augmentation": False,
          "mixture_augmentation": False, "supervision": "full",
          "test_stride": 1, "center_pixel": True, "patch_size": PATCH}
    net, optimizer, criterion, hp = r_mu.get_model("Multimodality_Mamba",
                                                   **hp)

    # --- inference loop (ref: test()) ------------------------------------
    net.eval()
    probs = np.zeros((64, 64, CLASSES), np.float32)
    done, budget = 0, 60.0
    t0 = time.time()
    with torch.no_grad():
        from utils import grouper, sliding_window  # reference's own

        for batch in grouper(hp["batch_size"],
                             sliding_window(img1, img2, step=1,
                                            window_size=(PATCH, PATCH))):
            data = torch.from_numpy(
                np.copy([b[0] for b in batch]).transpose(0, 3, 1, 2))
            data2 = torch.from_numpy(
                np.copy([b[1] for b in batch]).transpose(0, 3, 1, 2))
            out = net(data, data2)
            out = out.numpy()
            for (x, y, w, h), o in zip([b[2:] for b in batch], out):
                probs[x + w // 2, y + h // 2] += o
            done += len(batch)
            if time.time() - t0 > budget:
                break
    infer_rate = done / (time.time() - t0)
    print(f"reference flagship inference: {infer_rate:.1f} patches/s "
          f"({done} patches)", flush=True)

    # --- train loop (ref: train() body) ----------------------------------
    gt = rng.randint(1, CLASSES, size=(64, 64))
    ds = r_datasets.MultiModalX(img1, img2, gt, **hp)
    loader = torch.utils.data.DataLoader(ds, batch_size=hp["batch_size"],
                                         shuffle=True)
    net.train()
    done, budget = 0, 60.0
    t0 = time.time()
    for data, data2, target in itertools.islice(
            itertools.cycle(loader), 10_000):
        optimizer.zero_grad()
        loss = criterion(net(data, data2), target)
        loss.backward()
        optimizer.step()
        done += len(target)
        if time.time() - t0 > budget:
            break
    train_rate = done / (time.time() - t0)
    print(f"reference flagship train: {train_rate:.1f} patches/s "
          f"({done} patches)", flush=True)

    merged = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            merged = json.load(f)
    merged.update({
        "reference_model_infer_patches_per_sec": infer_rate,
        "reference_model_train_patches_per_sec": train_rate,
        "reference_model_note": "ACTUAL reference Multimodality_Mamba "
        "(144 bands, patch 9, batch 64) on torch CPU through the "
        "reference's own sliding-window/test() and train() loop shapes; "
        "measured by perf/measure_ref_baseline.py",
    })
    with open(BASELINE_FILE, "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote", os.path.abspath(BASELINE_FILE))


if __name__ == "__main__":
    main()
