"""Train state: params + batch_stats + optimizer state + step.

One disciplined container for the BatchNorm-heavy model zoo (SURVEY.md §7
hard part #2): batch statistics are part of the state and threaded through
every jitted step via ``mutable=['batch_stats']``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None

    @classmethod
    def create_from_variables(cls, apply_fn: Callable, variables, tx):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls.create(apply_fn=apply_fn, params=params, tx=tx,
                          batch_stats=batch_stats)

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v
