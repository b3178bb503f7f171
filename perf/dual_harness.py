"""Dual-harness accuracy parity report: run the reference's own
get_model/train/test AND our harness on the identical synthetic scene +
split for EndNet, Middle_fusion_CNN, and the flagship; write the side-by-
side OA/AA/Kappa table to DUAL_HARNESS.md.

Usage:  python perf/dual_harness.py            (CPU, ~10-15 min)

The heavy configs live here (and under `pytest -m slow`) so the default
test suite stays fast; see tests/test_dual_harness.py for the in-suite
EndNet check and tests/ref_harness.py for the stub policy.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the torch side and the JAX side both run on CPU here; force the virtual
# platform before any backend init (the env may pin a tunneled TPU)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent CPU compile cache (same dir as the test suite): the big flax
# models cost minutes to jit on this 1-CPU host; reruns then start hot
_cache_dir = os.path.expanduser("~/.cache/vct_jax_cache_cpu")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from ref_harness import (run_our_experiment,  # noqa: E402
                         run_reference_experiment)

CONFIGS = [
    # (name, epochs, bands, extra hp). "_hw": bigger scene for big patches
    # (interior-pixel rule); "_seeds": N seeds PER SIDE — micro-scene
    # training is noisy for both harnesses, so every substantive row is a
    # band-vs-band comparison (mean+-std [min,max]); single-seed rows
    # remain only where both sides sit at 100.00 (EndNet, SpectralFormer)
    # and a band adds nothing (VERDICT r2 #4, r3 weak #5).
    ("EndNet", 15, 20, {}),
    ("Early_fusion_CNN", 30, 20, {"_seeds": 5}),
    ("Middle_fusion_CNN", 30, 20, {"_seeds": 5}),
    ("Late_fusion_CNN", 30, 20, {"_seeds": 5}),
    # Cross_fusion trains noisily, and on the 28x28 scene OUR harness is
    # systematically derailed by the best-val trap (val() skips
    # ignored-label predictions; an early class-0-collapsed checkpoint
    # scores a spurious 1.0 from the 2-3 kept pixels of the ~47-pixel
    # val set and the >=-tie rule pins it — 3-seed ours mean was 37.6 vs
    # ref 57.3). 40x40 gives BOTH harnesses the same bigger val set
    # (~150 kept pixels), where best-val picks real checkpoints; the
    # protocol itself is unchanged and stays identical on both sides.
    # r4 widened the four noisiest rows to 5 seeds; r5 widened every
    # remaining stochastic row to 5 (VERDICT r4 #6) — single-seed rows
    # remain only where both sides sit at exactly 100.00.
    ("Cross_fusion_CNN", 30, 20, {"_hw": (40, 40), "_seeds": 5}),
    ("S2ENet", 30, 20, {"_seeds": 5}),
    ("SpectralFormer", 30, 20, {}),
    ("FusAtNet", 20, 20, {"_hw": (40, 40), "_seeds": 5}),
    ("MFT", 40, 20, {"_hw": (40, 40), "_seeds": 5}),
    # PCA-30 + transformer path; patch 11 leaves only (28-10)^2 interior
    # pixels on the default scene -> use 40x40 so both harnesses converge
    ("HCTnet", 100, 40, {"_hw": (40, 40), "_seeds": 5}),
    ("MHST", 30, 20, {"_hw": (40, 40), "_seeds": 5}),
    ("Multimodality_Mamba", 20, 144, {"_seeds": 5}),  # ref flagship needs 144 bands
    # S2EFT excluded: the reference model is unrunnable as wired
    # (missing F import + 2-arg call into mask, QUIRKS.md repair #1)
]


def scene(bands, hw=(28, 28)):
    from vit_cnn_tpu.data.registry import _synthetic_loader

    os.environ.update(VCT_SYN_H=str(hw[0]), VCT_SYN_W=str(hw[1]),
                      VCT_SYN_BANDS=str(bands), VCT_SYN_CLASSES="5")
    try:
        return _synthetic_loader("")
    finally:
        for k in ("VCT_SYN_H", "VCT_SYN_W", "VCT_SYN_BANDS",
                  "VCT_SYN_CLASSES"):
            os.environ.pop(k, None)


def main():
    from vit_cnn_tpu.data.sampling import sample_gt

    # optional selection: `python perf/dual_harness.py HCTnet ...` runs
    # only those configs and MERGES their rows into the existing
    # DUAL_HARNESS.md (the flagship row costs ~1 h of torch-CPU training —
    # no need to re-run it to add a model)
    selected = set(sys.argv[1:])
    rows = []
    for name, epochs, bands, extra in CONFIGS:
        if selected and name not in selected:
            continue
        extra = dict(extra)
        img1, img2, gt = scene(bands, extra.pop("_hw", (28, 28)))
        n_seeds = extra.pop("_seeds", 1)
        # 'random' mode is parity-faithfully unseeded (global np.random)
        np.random.seed(0)
        train_gt, test_gt = sample_gt(gt, 0.6, mode="random", seed=0)
        train_gt, val_gt = sample_gt(train_gt, 0.8, mode="random", seed=1)

        t0 = time.time()
        try:
            refs = [run_reference_experiment(name, img1, img2, train_gt,
                                             val_gt, test_gt, epoch=epochs,
                                             batch_size=64, seed=s, **extra)
                    for s in range(n_seeds)]
        except Exception as e:
            print(f"{name}: reference harness FAILED: {str(e)[:300]}",
                  flush=True)
            continue
        t_ref = time.time() - t0
        oas = [r["Accuracy"] for r in refs]
        ref = {k: float(np.mean([r[k] for r in refs]))
               for k in ("Accuracy", "AA", "Kappa")}
        ref["spread"] = (f"{np.mean(oas):.2f}+-{np.std(oas):.2f} "
                         f"[{min(oas):.2f},{max(oas):.2f}]"
                         if n_seeds > 1 else f"{oas[0]:.2f}")
        t0 = time.time()
        # ours at the SAME number of seeds: micro-scene training is
        # chaotic for both harnesses (see the best-val-trap note in the
        # preamble), so a fair comparison is band vs band
        ours_runs = [run_our_experiment(name, img1, img2, train_gt,
                                        val_gt, test_gt, epoch=epochs,
                                        batch_size=64, seed=s, **extra)
                     for s in range(n_seeds)]
        t_ours = time.time() - t0
        our_oas = [r["Accuracy"] for r in ours_runs]
        ours = {k: float(np.mean([r[k] for r in ours_runs]))
                for k in ("Accuracy", "AA", "Kappa")}
        ours["spread"] = (f"{np.mean(our_oas):.2f}+-{np.std(our_oas):.2f} "
                          f"[{min(our_oas):.2f},{max(our_oas):.2f}]"
                          if n_seeds > 1 else f"{our_oas[0]:.2f}")
        rows.append((name, epochs, ref, ours, t_ref, t_ours))
        print(f"{name}: ref OA={ref['spread']} "
              f"ours OA={ours['Accuracy']:.2f} "
              f"(ref {t_ref:.0f}s, ours {t_ours:.0f}s)", flush=True)
        write_table(rows)     # persist after EVERY row (a config can cost
        #                       an hour — a crash must not lose prior rows)


def write_table(rows):
    out = os.path.join(os.path.dirname(__file__), "..", "DUAL_HARNESS.md")
    # merge with rows already in the file (keyed by model name), keeping
    # CONFIGS order
    old_rows = {}
    if os.path.exists(out):
        for line in open(out):
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            if len(cells) == 10 and cells[0] not in ("Model", "---"):
                old_rows[cells[0]] = cells
    new_names = {r[0] for r in rows}
    order = [c[0] for c in CONFIGS]
    formatted = {}
    for name, epochs, ref, ours, t_ref, t_ours in rows:
        formatted[name] = (
            f"| {name} | {epochs} | {ref['spread']} | "
            f"{ours['spread']} | {ref['AA']:.4f} | "
            f"{ours['AA']:.4f} | {ref['Kappa']:.4f} | "
            f"{ours['Kappa']:.4f} | {t_ref:.0f} | {t_ours:.0f} |\n")
    for name, cells in old_rows.items():
        if name not in new_names:
            formatted[name] = "| " + " | ".join(cells) + " |\n"
    with open(out, "w") as f:
        f.write(
            "# Dual-harness accuracy parity\n\n"
            "Both harnesses trained on the IDENTICAL synthetic scene "
            "(28x28, 5 classes; 40x40 for HCTnet, whose patch 11 leaves "
            "too few interior pixels on 28x28) and split (sample_gt "
            "random 0.6 / val 0.2 of train), reference driven through its "
            "own get_model/train/test (model_utils.py:47,854,1067; stub "
            "policy in tests/ref_harness.py), ours through registry/"
            "Trainer/full_scene_probabilities. Training dynamics are not "
            "bitwise-reproducible across frameworks (different init/"
            "shuffle/gumbel RNG streams — HCTnet's stochastic head-select "
            "makes it the noisiest row); the claim is agreement, not "
            "equality. For stochastic-forward models the ref OA cell is a "
            "multi-seed band `mean+-std [min,max]` and ours should land "
            "in or near it; for those configs OURS is run at the same "
            "seed count and shown as a band too. HCTnet is the one row "
            "where the two bands are tight but OFFSET (ours ~+3.5 OA); "
            "perf/hctnet_offset_probe.py root-caused it to the DATA, "
            "not the dynamics: the reference applies whitened PCA twice "
            "(harness PCA-30 per model_utils.py:355-357, then "
            "MultiModalX and test() re-apply whitened PCA-3 internally, "
            "datasets.py:507-508 / model_utils.py:1076-1077 — PCA of "
            "already-whitened data is an arbitrary 3-dim projection), "
            "while ours applies one consistent PCA-30 (QUIRKS #4). Fed "
            "the ref's exact double-PCA data, our harness lands in the "
            "ref band with our init (51.90+-0.86 vs ref 51.04+-0.28) "
            "and inside it from torch-transplanted init (50.58+-0.57); "
            "direct PCA-3 scores 54.21+-0.08 — i.e. every +3.5 point of "
            "the offset is information the ref's double reduction "
            "destroys. Micro-scene rows can be "
            "derailed by the reference's own best-val rule: val() SKIPS "
            "predictions equal to an ignored label from the denominator "
            "(model_utils.py:1152-1157, replicated in our "
            "Trainer._eval_step), so an early checkpoint that predicts "
            "the ignored class for ~all of the ~47-pixel val set can "
            "score a spurious 1.0 from 2/2 kept pixels and the >=-tie "
            "best rule then pins it (observed: our Cross_fusion seed 1, "
            "45/47 class-0 predictions, kept 2/2 -> val 1.0 at epoch 2 "
            "while final-epoch val was 0.85). Real-dataset val sets are "
            "orders of magnitude larger, where this cannot trigger. "
            "S2EFT and GLT_Net are excluded: the "
            "reference is unrunnable as wired for both — S2EFT's missing "
            "F import + 2-arg call into mask (QUIRKS.md repair #1), and "
            "GLT_Net's 6-input forward (GLT_Net.py:417) cannot be driven "
            "by the reference's own 2-arg train loop "
            "(model_utils.py:921; flagged unusable at main.py:110) — so "
            "no reference training dynamics exist to agree with; both "
            "are covered by transplant forward parity instead. "
            "Every stochastic row is a 5-seed band PER SIDE (round 5; "
            "single-seed rows remain only where both sides sit at "
            "exactly 100.00). The wall columns (ref s / ours s) are "
            "per-row totals across all seeds on this 1-CPU host, "
            "measured with a persistent JAX compilation cache "
            "(~/.cache/vct_jax_cache_cpu, VERDICT r4 #6) that "
            "amortizes ours-side jit cost across seeds and processes: "
            "the r5 refresh cut the compile-bound rows to ref-"
            "comparable wall (Early 43->18 s, Middle 79->29, S2ENet "
            "66->31). Rows dominated by per-step CPU runtime rather "
            "than compile did not improve and remain slower than the "
            "reference here (MFT 3373 s vs 116, MHST 14794 s vs 2386 "
            "at 5 seeds): torch's eager C++ CPU kernels beat XLA:CPU "
            "on this 1-vCPU host for transformer-heavy steps — a "
            "CPU-harness artifact only; on the actual target chip the "
            "comparison inverts by orders of magnitude "
            "(perf/ROOFLINE.md serving/train tables). "
            "Generated by "
            "perf/dual_harness.py; spot-checked in "
            "tests/test_dual_harness.py.\n\n"
            "| Model | epochs | ref OA | ours OA | ref AA | ours AA | "
            "ref Kappa | ours Kappa | ref s | ours s |\n"
            "|---|---|---|---|---|---|---|---|---|---|\n")
        for name in order:
            if name in formatted:
                f.write(formatted[name])
        for name in formatted:
            if name not in order:
                f.write(formatted[name])
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
