from .convert import freeze_vit
from .engine import build_vit_infer
from .export import export_engine, load_engine
from .ingest_torch import torch_vit_state_to_artifact, unwrap_state_dict

__all__ = [
    "freeze_vit",
    "torch_vit_state_to_artifact",
    "unwrap_state_dict",
    "build_vit_infer",
    "export_engine",
    "load_engine",
]
