from .attention import attention_reference, fused_attention, fused_attention_auto
from .scan_paths import base_paths, inverse_permutation, path_orderings
from .selective_scan import (selective_scan, selective_scan_auto,
                             selective_scan_pallas)

__all__ = [
    "attention_reference", "fused_attention", "fused_attention_auto",
    "base_paths", "inverse_permutation", "path_orderings",
    "selective_scan", "selective_scan_auto", "selective_scan_pallas",
]
