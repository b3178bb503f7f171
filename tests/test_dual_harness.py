"""Dual-harness end-to-end accuracy parity (VERDICT r1 missing #2): drive
the reference's OWN get_model/train/test (ref: model_utils.py:47,854,1067)
and our harness on the IDENTICAL synthetic scene and split, and compare
final OA/AA/Kappa.

This covers what transplanted-weight parity cannot: optimizer semantics,
BN-statistic updates, best-val selection, scheduler stepping, and the
full-scene inference geometry interacting over a whole training run.
Training dynamics are not bitwise-reproducible across frameworks (different
init/shuffle RNG), so the assertion is agreement within a tolerance on an
easily-learnable scene, plus an absolute floor that both harnesses must
clear.

EndNet runs in the default suite; the CNN and flagship configs run via
perf/dual_harness.py (results committed in DUAL_HARNESS.md) and under
pytest -m slow.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference tree not mounted")
pytest.importorskip("torch")

from ref_harness import run_our_experiment, run_reference_experiment  # noqa


def _scene(h=28, w=28, bands=20, n_cls=5, seed=0):
    from vit_cnn_tpu.data.registry import _synthetic_loader

    os.environ.update(VCT_SYN_H=str(h), VCT_SYN_W=str(w),
                      VCT_SYN_BANDS=str(bands), VCT_SYN_CLASSES=str(n_cls))
    try:
        return _synthetic_loader("")
    finally:
        for k in ("VCT_SYN_H", "VCT_SYN_W", "VCT_SYN_BANDS",
                  "VCT_SYN_CLASSES"):
            os.environ.pop(k, None)


def _split(gt, seed=0):
    from vit_cnn_tpu.data.sampling import sample_gt

    # 'random' mode is parity-faithfully unseeded (global np.random); pin
    # the global stream for order-independence across the suite
    np.random.seed(seed)
    train_gt, test_gt = sample_gt(gt, 0.6, mode="random", seed=seed)
    train_gt, val_gt = sample_gt(train_gt, 0.8, mode="random", seed=seed + 1)
    return train_gt, val_gt, test_gt


def _compare(name, tol_oa, tol_kappa, epochs, tmp_path, floor_oa=80.0,
             **hp):
    img1, img2, gt = _scene(bands=hp.pop("bands", 20))
    train_gt, val_gt, test_gt = _split(gt)

    cwd = os.getcwd()
    os.chdir(tmp_path)          # reference save_model writes ./checkpoints
    try:
        ref = run_reference_experiment(name, img1, img2, train_gt, val_gt,
                                       test_gt, epoch=epochs, **hp)
    finally:
        os.chdir(cwd)
    ours = run_our_experiment(name, img1, img2, train_gt, val_gt, test_gt,
                              epoch=epochs, **hp)

    oa_r, oa_o = ref["Accuracy"], ours["Accuracy"]
    k_r, k_o = ref["Kappa"], ours["Kappa"]
    aa_r, aa_o = ref["AA"], ours["AA"]
    print(f"\n{name}: ref OA={oa_r:.2f} AA={aa_r:.4f} Kappa={k_r:.4f} | "
          f"ours OA={oa_o:.2f} AA={aa_o:.4f} Kappa={k_o:.4f}")
    # both harnesses must actually learn the scene (well above the 20%
    # 5-class chance level; the per-config floor reflects how far the
    # REFERENCE itself converges in `epochs` — e.g. Middle_fusion_CNN
    # reaches only ~56-60 OA in 30 torch-CPU epochs, with +-2 OA of
    # unseeded-RNG jitter on the reference side)...
    assert oa_r > floor_oa, f"reference failed to learn: OA={oa_r}"
    assert oa_o > floor_oa, f"ours failed to learn: OA={oa_o}"
    # ...and agree within tolerance
    assert abs(oa_r - oa_o) < tol_oa
    assert abs(k_r - k_o) < tol_kappa
    assert abs(aa_r - aa_o) < tol_oa / 100.0
    return ref, ours


def test_endnet_dual_harness_parity(tmp_path):
    _compare("EndNet", tol_oa=5.0, tol_kappa=0.07, epochs=15,
             tmp_path=tmp_path, batch_size=64)


@pytest.mark.slow
def test_middle_fusion_dual_harness_parity(tmp_path):
    _compare("Middle_fusion_CNN", tol_oa=6.0, tol_kappa=0.08, epochs=30,
             tmp_path=tmp_path, batch_size=64, floor_oa=45.0)


# The flagship dual-harness comparison needs ~20 epochs of the reference
# flagship on torch CPU (~15 min) to converge, so it runs through
# perf/dual_harness.py; the side-by-side numbers are committed in
# DUAL_HARNESS.md.
