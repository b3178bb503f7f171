from .mesh import (batch_sharding, make_mesh, pad_to_multiple_of_devices,
                   replicate, replicated, shard_batch)

__all__ = ["batch_sharding", "make_mesh", "pad_to_multiple_of_devices",
           "replicate", "replicated", "shard_batch"]
