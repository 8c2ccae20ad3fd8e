from .metrics import AverageMeter, MetricLogger
from .checkpoint import (
    save_checkpoint,
    load_checkpoint,
    load_checkpoint_raw,
    save_checkpoint_orbax,
    load_checkpoint_orbax,
    save_artifact,
    load_artifact,
)

__all__ = [
    "AverageMeter",
    "MetricLogger",
    "save_checkpoint",
    "load_checkpoint",
    "load_checkpoint_raw",
    "save_artifact",
    "load_artifact",
]
