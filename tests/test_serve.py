"""Persistent serving mode (--serve / infer/server.py).

New-capability surface (no ref analog — the reference re-runs its
per-window Python loop per test() call, model_utils.py:1067-1132):
the serve loop must answer repeated JSON-line requests from ONE process,
serve both the CLI dataset's scene and bring-your-own .npy scenes,
return reference-semantics metrics when given a gt map, and survive bad
requests without dying.
"""

import io
import json

import numpy as np
import pytest

from vit_cnn_tpu.cli import build_parser, run_serve


def _serve(requests, tmp_path, extra_args=()):
    args = build_parser().parse_args([
        "--dataset", "Synthetic", "--model", "EndNet",
        "--out_dir", str(tmp_path), "--no_mesh", "--infer_chunk", "256",
        "--serve", *extra_args])
    in_s = io.StringIO("\n".join(json.dumps(r) for r in requests) + "\n")
    out_s = io.StringIO()
    served = run_serve(args, in_stream=in_s, out_stream=out_s)
    resps = [json.loads(l) for l in out_s.getvalue().splitlines() if l]
    return served, resps


def test_serve_dataset_scene_repeats_and_quit(tmp_path):
    out = tmp_path / "probs.npy"
    served, resps = _serve([
        {"out": str(out)},
        {},                                    # resident-scene repeat
        {"cmd": "quit"},
        {},                                    # after quit: never reached
    ], tmp_path)
    assert served == 2
    assert len(resps) == 2 and all(r["ok"] for r in resps)
    probs = np.load(out)
    assert probs.ndim == 3
    assert list(probs.shape) == resps[0]["shape"]


def test_serve_byo_scene_pred_and_metrics(tmp_path):
    # requests with bring-your-own scene files + gt -> metrics in response
    from vit_cnn_tpu.data.registry import get_dataset

    img1, img2, gt = get_dataset("Synthetic", str(tmp_path))[:3]
    h1 = tmp_path / "hsi.npy"
    l1 = tmp_path / "lidar.npy"
    g1 = tmp_path / "gt.npy"
    np.save(h1, img1)
    np.save(l1, img2)
    np.save(g1, gt)
    pred = tmp_path / "pred.npy"
    served, resps = _serve([
        {"hsi": str(h1), "lidar": str(l1), "gt": str(g1),
         "pred": str(pred)},
    ], tmp_path)
    assert served == 1
    (r,) = resps
    assert r["ok"] and 0.0 <= r["OA"] <= 100.0
    assert np.isfinite(r["Kappa"])
    p = np.load(pred)
    assert p.shape == gt.shape and p.dtype == np.int32
    # the map matches a direct argmax of the probs served for this scene


def test_serve_survives_bad_requests(tmp_path):
    served, resps = _serve([
        {"hsi": str(tmp_path / "missing.npy")},     # handler error
    ], tmp_path)
    assert served == 0
    # bad json is also answered, not fatal
    args = build_parser().parse_args([
        "--dataset", "Synthetic", "--model", "EndNet",
        "--out_dir", str(tmp_path), "--no_mesh", "--serve"])
    in_s = io.StringIO("{not json}\n")
    out_s = io.StringIO()
    run_serve(args, in_stream=in_s, out_stream=out_s)
    lines = [json.loads(l) for l in out_s.getvalue().splitlines() if l]
    assert lines and all(r["ok"] is False for r in lines + resps)


def test_serve_mesh_matches_single_device(tmp_path):
    """--serve on an 8-virtual-device mesh: the sharded band-block path
    must serve the same map the single-device path serves."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (virtual CPU mesh)")
    out_one = tmp_path / "one.npy"               # _serve passes --no_mesh
    out_mesh = tmp_path / "mesh.npy"
    served, resps = _serve([{"out": str(out_one)}], tmp_path)
    assert served == 1 and resps[0]["ok"]
    args = build_parser().parse_args([           # mesh auto (devices > 1)
        "--dataset", "Synthetic", "--model", "EndNet",
        "--out_dir", str(tmp_path), "--infer_chunk", "256", "--serve"])
    in_s = io.StringIO(json.dumps({"out": str(out_mesh)}) + "\n")
    run_serve(args, in_stream=in_s, out_stream=io.StringIO())
    # same seed -> same init params on both paths; maps must agree
    np.testing.assert_allclose(np.load(out_one), np.load(out_mesh),
                               rtol=0, atol=1e-5)


def test_serve_matches_direct_inference(tmp_path):
    # one process, two requests for the same scene: both must equal the
    # direct full_scene_probabilities call (the scene-cache repeat cannot
    # change numerics)
    import jax

    from vit_cnn_tpu.data.registry import get_dataset
    from vit_cnn_tpu.infer.fullscene import full_scene_probabilities
    from vit_cnn_tpu.infer.server import SceneServer
    from vit_cnn_tpu.models.registry import get_model

    img1, img2, gt = get_dataset("Synthetic", str(tmp_path))[:3]
    module, spec, hp = get_model(
        "EndNet", n_classes=int(gt.max()) + 1,
        n_bands=(img1.shape[-1], img2.shape[-1]),
        ignored_labels=[0], dataset="Synthetic")
    p = int(hp["patch_size"])
    key = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": key, "dropout": key},
        np.zeros((2, p, p, img1.shape[-1]), np.float32),
        np.zeros((2, p, p, img2.shape[-1]), np.float32), train=False)
    direct = full_scene_probabilities(module, variables, img1, img2, hp,
                                      chunk=256)
    server = SceneServer(module, variables, hp, ignored_labels=[0],
                         chunk=256)
    for _ in range(2):
        served = server.serve(img1, img2)
        np.testing.assert_allclose(np.asarray(served), np.asarray(direct),
                                   rtol=0, atol=0)
