"""Tri-state env gates for Pallas kernel paths.

Every Mosaic kernel family is routed through one of these gates so an
unverified kernel can never become a default TPU path (round-3 lesson:
repeated doomed Mosaic compiles wedge the shared remote-compile tunnel).
Semantics, shared by every flag:

  * ``"0"``      — OFF everywhere (XLA reference composition).
  * ``"1"``      — ON when the backend is TPU, off elsewhere.
  * ``"force"``  — ON regardless of backend (interpret-mode testing).

The *default* differs per flag and is stated explicitly at each call
site: hardware-verified kernels default ``"1"``; kernels whose check
script (`perf/pooled_kernel_check.py` chain) has not yet passed on the
real chip default ``"0"``.
"""

from __future__ import annotations

import os
import subprocess

import jax

# Source of truth for every kernel gate's CURRENT call-site default.
# tests/test_envflags.py::test_gate_defaults_match_call_sites pins each
# entry against the literal at its call site, and every perf table row
# is stamped with gate_state() (VERDICT r4 #4: freshness must be
# mechanically checkable, not prose).
GATE_DEFAULTS = {
    "VCT_LANE_MAJOR": "1",            # nn/mamba.py (hardware-verified r2)
    "VCT_HEADS_ATTN": "1",            # nn/transformer.py (verified r4)
    "VCT_POOLED_ATTN": "0",           # ops/attention.py (Mosaic miscompile
    #                                   rejection, perf/logs/pooled_check_r4.log)
    "VCT_DIRSTREAM_FUSED_BWD": "1",   # ops/dirstream.py (in-step A/B win
    #                                   r5: train 18,170 -> 19,749 p/s)
    "VCT_LN_GROUPS_MM": "0",          # ops/attention.py (pure-XLA matmul-stat
    #                                   group LN; perf gate, r5)
}


def gate_state() -> dict:
    """Effective value of every known kernel gate (env override or the
    call-site default) — the gate half of a bench stamp."""
    return {k: (os.environ.get(k) or d) for k, d in GATE_DEFAULTS.items()}


def bench_stamp() -> dict:
    """{git_sha, dirty, gates} identifying the code epoch of a perf
    measurement. Emitted with every bench.py / perf/bench_models.py row
    so table freshness is checkable mechanically (VERDICT r4 #4)."""
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            capture_output=True, text=True, timeout=10).stdout.strip()
        dirty = bool(subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            capture_output=True, text=True, timeout=10).stdout.strip())
    except Exception:  # noqa: BLE001 — stamping must never break a bench
        sha, dirty = "unknown", False
    return {"git_sha": sha or "unknown", "dirty": dirty,
            "gates": gate_state()}


def stamp_str(stamp: dict | None = None) -> str:
    """One-line machine-readable stamp, e.g.
    ``sha=0c52d7e gates=LANE_MAJOR:1,HEADS_ATTN:1,POOLED_ATTN:0,DIRSTREAM_FUSED_BWD:0``.
    perf/ROOFLINE.md embeds these next to its tables;
    tests/test_benchstamp.py fails if an embedded stamp's gates disagree
    with today's GATE_DEFAULTS (a flipped default forces a re-measure)."""
    stamp = stamp or bench_stamp()
    gates = ",".join(f"{k[4:]}:{v}" for k, v in sorted(
        stamp["gates"].items()))
    return "sha={}{} gates={}".format(
        stamp["git_sha"], "+dirty" if stamp["dirty"] else "", gates)


def kernel_gate(name: str, default: str) -> bool:
    """True when the kernel path named by env var ``name`` should run.

    ``default`` is used when the variable is unset or empty, making the
    flag's default sense visible at the call site instead of hidden in
    string comparisons (ADVICE r3: VCT_LANE_MAJOR and
    VCT_DIRSTREAM_FUSED_BWD had opposite implicit defaults).
    """
    env = os.environ.get(name) or default
    if env == "0":
        return False
    return env == "force" or jax.default_backend() == "tpu"
