"""Device mesh + sharding helpers.

The reference has no distributed layer at all (single CPU/CUDA device,
ref: utils.py:95-106; SURVEY.md §5 "Distributed communication backend:
none"). The TPU-native equivalent: a ``jax.sharding.Mesh`` over ICI with
data parallelism as the primary axis — the patch batch during training and
the sliding-window grid during full-scene inference are sharded over
``data``; parameters are replicated; XLA inserts the collectives
(gradient psum etc.) from the sharding annotations.

Hooks for tp/sp axes exist (``make_mesh(axes=...)``) but, matching the
reference's model sizes (a few M params, <=122 tokens), no dedicated
tensor/pipeline machinery is warranted (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first n_devices devices. Default: 1-D 'data'
    axis over all devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 (the batch) over the mesh's data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place a host array with its leading dim sharded over `axis`."""
    return jax.device_put(x, batch_sharding(mesh, axis))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple_of_devices(n: int, mesh: Mesh, multiple: int = 1) -> int:
    """Smallest m >= n divisible by (#devices * multiple)."""
    q = mesh.devices.size * multiple
    return ((n + q - 1) // q) * q
