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

import jax


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
