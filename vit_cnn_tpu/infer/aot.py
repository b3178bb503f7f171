"""Cross-process AOT cache for serving executables (VERDICT r2 #6).

The reference has zero compile latency; our flagship band program costs
minutes to build through a remote-compile backend, and the XLA persistent
compilation cache fingerprint is unstable across processes for the big
Mosaic programs on this backend. ``jax.experimental.serialize_executable``
sidesteps both: the COMPILED executable is pickled once and deserialized
in ~0.2 s by any later process on the same topology/runtime
(perf/aot_probe.py, 2026-08-17).

Staleness: the key covers the jax version, the module repr (architecture
config), every argument's shape/dtype and the static call parameters — but
NOT the Python source of the model. Editing model code without changing
its config repr requires clearing the cache (or set VCT_AOT_SALT).
Deserialization failures fall back to a normal jit compile transparently.
"""

from __future__ import annotations

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


def _describe(tree) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parts = [str(treedef)]
    parts += [f"{getattr(x, 'shape', ())}:{getattr(x, 'dtype', type(x))}"
              for x in leaves]
    return "|".join(parts)


def cache_key(key_parts, example_args) -> str:
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
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
