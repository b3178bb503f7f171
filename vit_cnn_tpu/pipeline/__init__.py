from .patches import (AugmentConfig, PatchPipeline, augment_batch,
                      build_class_index_table, gather_patches,
                      interior_indices)
from .twoview import TwoViewPipeline

__all__ = [
    "AugmentConfig", "PatchPipeline", "augment_batch",
    "build_class_index_table", "gather_patches", "interior_indices", "TwoViewPipeline",
]
