from .convert import freeze_vit
from .engine import build_vit_infer

__all__ = ["freeze_vit", "build_vit_infer"]
