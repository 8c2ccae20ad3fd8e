from .convert import freeze_vit
from .engine import build_vit_infer
from .export import export_engine, load_engine

__all__ = [
    "freeze_vit",
    "build_vit_infer",
    "export_engine",
    "load_engine",
]
