from .vit import (
    VisionTransformer,
    deit_tiny_patch16_224,
    deit_small_patch16_224,
    deit_base_patch16_224,
    vit_base_patch16_224,
    vit_large_patch16_224,
)
from .registry import MODEL_REGISTRY, create_model

__all__ = [
    "VisionTransformer",
    "deit_tiny_patch16_224",
    "deit_small_patch16_224",
    "deit_base_patch16_224",
    "vit_base_patch16_224",
    "vit_large_patch16_224",
    "MODEL_REGISTRY",
    "create_model",
]
