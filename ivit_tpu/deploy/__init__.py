from .convert import freeze_vit
from .engine import build_vit_infer
from .export import export_engine, load_engine
from .ingest_torch import torch_vit_state_to_artifact, unwrap_state_dict
from .weight_args import build_infer_weight_args

__all__ = [
    "build_infer_weight_args",
    "freeze_vit",
    "torch_vit_state_to_artifact",
    "unwrap_state_dict",
    "build_vit_infer",
    "export_engine",
    "load_engine",
]
