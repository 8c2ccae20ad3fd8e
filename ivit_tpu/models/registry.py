"""Model registry: name → factory.

Analogue of the reference ``str2model`` dict
(/root/reference/quant_train.py:141-150); Swin entries are added by
``models/swin.py`` when it registers itself.
"""

from __future__ import annotations

from . import swin, swin_float, vit, vit_float

MODEL_REGISTRY = {
    "deit_tiny_fp32": vit_float.deit_tiny_fp32,
    "deit_small_fp32": vit_float.deit_small_fp32,
    "deit_base_fp32": vit_float.deit_base_fp32,
    "vit_base_fp32": vit_float.vit_base_fp32,
    "vit_large_fp32": vit_float.vit_large_fp32,
    "swin_tiny_fp32": swin_float.swin_tiny_fp32,
    "swin_small_fp32": swin_float.swin_small_fp32,
    "swin_base_fp32": swin_float.swin_base_fp32,
    "deit_tiny": vit.deit_tiny_patch16_224,
    "deit_small": vit.deit_small_patch16_224,
    "deit_base": vit.deit_base_patch16_224,
    "vit_base": vit.vit_base_patch16_224,
    "vit_large": vit.vit_large_patch16_224,
    "swin_tiny": swin.swin_tiny_patch4_window7_224,
    "swin_small": swin.swin_small_patch4_window7_224,
    "swin_base": swin.swin_base_patch4_window7_224,
}


def create_model(name: str, **kwargs):
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](**kwargs)
