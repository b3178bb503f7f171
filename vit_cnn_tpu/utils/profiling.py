"""Tracing / profiling utilities (SURVEY.md §5 "Tracing / profiling").

The reference's only instrumentation is a thop FLOP/param count in the
Mamba __main__ block (ref: Mutimodality_Mamba7.py:22-23,1198-1199) and a
commented-out torchsummary (ref: main.py:452-457). TPU-native equivalents:

* :func:`count_params` / :func:`flops` — parameter and XLA-cost-analysis
  FLOP counts for any (module, inputs) pair: the thop.profile equivalent,
  but exact (it reads the compiled HLO's cost model, not a per-op table).
* :func:`clever_format` — same human formatting thop provides.
* :func:`profile_model` — one call returning both, formatted.
* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory.
* :class:`Throughput` — patches/sec/chip counter for train/inference loops
  (the BASELINE metric).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import numpy as np


def count_params(variables) -> int:
    """Total parameter count (thop 'params' equivalent)."""
    params = variables.get("params", variables)
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def flops(fn, *args) -> float:
    """FLOPs of one jitted call of ``fn(*args)`` from XLA's cost analysis
    (thop 'macs' analog; XLA counts FLOPs, i.e. ~2x MACs)."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def clever_format(value: float, suffix: str = "") -> str:
    """Human format a count (thop.clever_format parity: G/M/K)."""
    for unit, div in (("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if value >= div:
            return "{:.2f}{}{}".format(value / div, unit, suffix)
    return "{:.2f}{}".format(value, suffix)


def profile_model(module, variables, *inputs, **apply_kwargs) -> Dict:
    """FLOPs + params for a model forward (the reference's smoke-block
    `thop.profile(model, inputs=(x1, x2))` equivalent)."""
    f = flops(lambda v, *a: module.apply(v, *a, **apply_kwargs),
              variables, *inputs)
    p = count_params(variables)
    return {"flops": f, "params": p,
            "flops_str": clever_format(f), "params_str": clever_format(p)}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """TensorBoard profiler trace around a code region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Streaming items/sec counter (patches/sec/chip, the BASELINE metric).

    NOTE: through an asynchronous/tunneled backend, call :meth:`fence`
    (or pass a device array to :meth:`update`) so timing covers real
    execution, not dispatch.
    """

    def __init__(self, n_chips: int = 1):
        self.n_chips = max(n_chips, 1)
        self.items = 0
        self.t0: Optional[float] = None

    def start(self):
        self.t0 = time.time()
        self.items = 0
        return self

    @staticmethod
    def fence(x) -> None:
        """Force real completion of everything queued before ``x``."""
        jax.device_get(jax.tree_util.tree_leaves(x)[0])

    def update(self, n_items: int, fence_on: Any = None):
        if self.t0 is None:
            self.start()
        if fence_on is not None:
            self.fence(fence_on)
        self.items += n_items

    def rate(self) -> float:
        """items/sec/chip since start()."""
        if self.t0 is None or self.items == 0:
            return 0.0
        return self.items / (time.time() - self.t0) / self.n_chips
