from .vit import (
    VisionTransformer,
    deit_tiny_patch16_224,
    deit_small_patch16_224,
    deit_base_patch16_224,
    vit_base_patch16_224,
    vit_large_patch16_224,
)
from .swin import (
    SwinTransformer,
    swin_tiny_patch4_window7_224,
    swin_small_patch4_window7_224,
    swin_base_patch4_window7_224,
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
