"""Cross-process AOT cache for serving executables (VERDICT r2 #6).

The reference has zero compile latency; our flagship band program costs
minutes to build through a remote-compile backend, and the XLA persistent
compilation cache fingerprint is unstable across processes for the big
Mosaic programs on this backend. ``jax.experimental.serialize_executable``
sidesteps both: the COMPILED executable is pickled once and deserialized
in ~0.2 s by any later process on the same topology/runtime
(perf/aot_probe.py, 2026-08-17).

Staleness: the key covers the jax/jaxlib versions, a content hash of the
package's compute-relevant source (models/nn/ops/infer/pipeline — so
editing kernel or model code invalidates entries automatically, ADVICE r3),
the module repr (architecture config), every argument's shape/dtype and
the static call parameters. ``VCT_AOT_SALT`` remains a manual override.
Deserialization failures fall back to a normal jit compile transparently.
"""

from __future__ import annotations

import glob
import hashlib
import os
import pickle
from typing import Tuple

import jax


def cache_dir() -> str:
    d = os.environ.get("VCT_AOT_CACHE_DIR",
                       os.path.expanduser("~/.cache/vct_aot"))
    os.makedirs(d, exist_ok=True)
    return d


_SOURCE_HASH: list = []       # computed once per process


def _source_hash() -> str:
    """Content hash of every .py under the package's compute-path dirs."""
    if not _SOURCE_HASH:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for sub in ("models", "nn", "ops", "infer", "pipeline"):
            for path in sorted(glob.glob(os.path.join(pkg, sub, "*.py"))):
                h.update(os.path.basename(path).encode())
                with open(path, "rb") as f:
                    h.update(f.read())
        _SOURCE_HASH.append(h.hexdigest())
    return _SOURCE_HASH[0]


def _describe(tree) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parts = [str(treedef)]
    parts += [f"{getattr(x, 'shape', ())}:{getattr(x, 'dtype', type(x))}"
              for x in leaves]
    return "|".join(parts)


_HOST_FP: list = []


def _host_fingerprint() -> str:
    """Backend platform/device kind, plus the host's CPU feature flags on
    the CPU backend. XLA:CPU AOT executables are compiled for the build
    host's ISA extensions — loading one on a host lacking them can die by
    SIGILL (observed as a loud warning in MULTICHIP_r04.json, VERDICT r4
    weak #6) — so the cache key must pin them."""
    if not _HOST_FP:
        dev = jax.devices()[0]
        fp = f"{dev.platform}:{getattr(dev, 'device_kind', '')}"
        if dev.platform == "cpu":
            try:
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        if line.startswith("flags"):
                            feats = " ".join(sorted(line.split(":", 1)[1]
                                                    .split()))
                            fp += ":" + hashlib.sha256(
                                feats.encode()).hexdigest()[:16]
                            break
            except OSError:
                fp += ":unknown-cpu-features"
        _HOST_FP.append(fp)
    return _HOST_FP[0]


def cache_key(key_parts, example_args) -> str:
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(getattr(jax.lib, "__version__", "").encode())
    h.update(_source_hash().encode())
    h.update(_host_fingerprint().encode())
    h.update(os.environ.get("VCT_AOT_SALT", "").encode())
    for p in key_parts:
        h.update(repr(p).encode())
    h.update(_describe(example_args).encode())
    return h.hexdigest()[:24]


_LOADED: dict = {}            # in-process memo: deserializing a big scene
#                               executable costs seconds — pay it once


def load_or_compile(jitted, key_parts, example_args) -> Tuple[object, bool]:
    """Return (compiled_executable, loaded_from_cache) for
    ``jitted(*example_args)``. Persists newly-compiled executables."""
    from jax.experimental import serialize_executable as se

    key = cache_key(key_parts, example_args)
    if key in _LOADED:
        return _LOADED[key], True
    path = os.path.join(cache_dir(), key + ".jaxexe")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            exe = se.deserialize_and_load(payload, in_tree, out_tree)
            _LOADED[key] = exe
            return exe, True
        except Exception:
            pass                      # stale/foreign entry: recompile below
    compiled = jitted.lower(*example_args).compile()
    _LOADED[key] = compiled
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
    except Exception:
        pass                          # serialization unsupported: still works
    return compiled, False
