from .layers import BatchNorm, ConvBNReLU, adaptive_avg_pool, max_pool_same
from .mamba import DirectionalMambaBackbone, MambaMixer, MultiDirMambaLayer
from .precision import bf16_apply, cast_floating
from .transformer import FeedForward, ViTAttention, ViTBackbone

__all__ = [
    "BatchNorm", "ConvBNReLU", "adaptive_avg_pool", "max_pool_same",
    "DirectionalMambaBackbone", "MambaMixer", "MultiDirMambaLayer",
    "bf16_apply", "cast_floating",
    "FeedForward", "ViTAttention", "ViTBackbone",
]
