"""Persistent full-scene serving process.

The cold-start decomposition (perf/cold_decomp.py; perf/ROOFLINE.md
"Cold-start decomposition") proved the remaining cold wall is process
lifecycle, not code: backend init + first-touch + scene upload cost
~30-40 s per fresh process on a quiet tunnel, while a RESIDENT process
re-serves a scene in ~11.8 s steady state (the device-resident scene
cache plus the AOT executable cache do the amortizing). The reference
has no serving story at all — every ``test()`` call re-pays its
per-window Python generator loop (ref: model_utils.py:1067-1132). This
module keeps ONE process alive: model parameters, compiled band
programs, and uploaded scenes all persist across requests.

Protocol (``--serve`` on the CLI): one JSON object per stdin line, one
JSON response per stdout line.

Request fields (all optional):
  hsi / lidar  paths to scene arrays (.npy, or ``file.mat:key``). When
               omitted, the CLI's ``--dataset`` scene is served — the
               second and later such requests hit the device-resident
               scene cache and run at the steady-state wall. Arrays are
               served AS GIVEN (the registry's per-band normalization is
               applied to dataset scenes only; bring-your-own scenes
               must arrive already normalized, like the reference's
               ``test()`` which also receives the preprocessed scene).
  out          path to save the (H, W, n_classes) probability map (.npy)
  pred         path to save the argmax label map (.npy)
  gt           path to a ground-truth map; the response then carries
               OA/AA/Kappa computed with the dataset's ignored labels
               (exact reference metric semantics, metrics/classification)
  stride       test stride override (default: the CLI's --test_stride)
  cmd          "quit" ends the loop

Response: {"ok": true, "seconds": ..., "shape": [...], ...} or
{"ok": false, "error": "..."}.
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional, TextIO

import numpy as np


def load_array(spec: str) -> np.ndarray:
    """Load ``path.npy`` or ``path.mat:key``."""
    from ..data.io import load_mat_key, open_file

    if ".mat:" in spec:
        path, key = spec.rsplit(":", 1)
        return np.asarray(load_mat_key(path, key))
    if spec.endswith(".mat"):
        raise ValueError(
            f"'{spec}': .mat scenes need the variable name — use "
            "'file.mat:key'")
    arr = open_file(spec)
    return np.asarray(arr)


class SceneServer:
    """Holds (module, variables, hyperparams) and serves scenes.

    Host scene arrays are kept referenced per path so the id()-keyed
    device-resident scene cache (infer/fullscene._device_scene) stays
    alive between requests for the same file.
    """

    def __init__(self, module, variables, hyperparams: Dict, mesh=None,
                 ignored_labels=(), chunk: int = 8192):
        self.module = module
        self.variables = variables
        self.hp = dict(hyperparams)
        self.mesh = mesh
        self.ignored_labels = list(ignored_labels)
        self.chunk = chunk
        self._scenes: Dict[str, np.ndarray] = {}

    def _scene(self, spec: Optional[str], default: np.ndarray):
        if not spec:
            return default
        if spec not in self._scenes:
            self._scenes[spec] = load_array(spec)
        return self._scenes[spec]

    def serve(self, img1: np.ndarray, img2: np.ndarray,
              stride: Optional[int] = None) -> np.ndarray:
        from .fullscene import full_scene_probabilities

        hp = self.hp
        if stride is not None:
            hp = dict(hp, test_stride=int(stride))
        return full_scene_probabilities(self.module, self.variables, img1,
                                        img2, hp, chunk=self.chunk,
                                        mesh=self.mesh)

    def handle(self, req: Dict, default_img1: np.ndarray,
               default_img2: np.ndarray) -> Dict:
        t0 = time.time()
        img1 = self._scene(req.get("hsi"), default_img1)
        img2 = self._scene(req.get("lidar"), default_img2)
        probs = self.serve(img1, img2, req.get("stride"))
        resp: Dict = {"ok": True, "shape": list(probs.shape)}
        if req.get("out"):
            np.save(req["out"], probs)
            resp["out"] = req["out"]
        if req.get("pred") or req.get("gt"):
            pred = np.argmax(probs, axis=-1).astype(np.int32)
            if req.get("pred"):
                np.save(req["pred"], pred)
                resp["pred"] = req["pred"]
            if req.get("gt"):
                from ..metrics.classification import metrics

                gt = self._scene(req["gt"], None)
                m = metrics(pred, gt, ignored_labels=self.ignored_labels,
                            n_classes=int(self.hp["n_classes"]))
                resp.update(OA=float(m["Accuracy"]), AA=float(m["AA"]),
                            Kappa=float(m["Kappa"]))
        resp["seconds"] = round(time.time() - t0, 3)
        return resp

    def loop(self, in_stream: TextIO, out_stream: TextIO,
             default_img1: np.ndarray, default_img2: np.ndarray) -> int:
        """Read JSON-line requests until EOF / cmd=quit; returns count."""
        served = 0
        for line in in_stream:
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
            except json.JSONDecodeError as e:
                print(json.dumps({"ok": False, "error": f"bad json: {e}"}),
                      file=out_stream, flush=True)
                continue
            if req.get("cmd") == "quit":
                break
            try:
                resp = self.handle(req, default_img1, default_img2)
                served += 1
            except Exception as e:               # keep the server alive
                resp = {"ok": False,
                        "error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(json.dumps(resp), file=out_stream, flush=True)
        return served
