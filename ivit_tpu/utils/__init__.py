from .metrics import AverageMeter, MetricLogger
from .checkpoint import save_checkpoint, load_checkpoint, save_artifact, load_artifact

__all__ = [
    "AverageMeter",
    "MetricLogger",
    "save_checkpoint",
    "load_checkpoint",
    "save_artifact",
    "load_artifact",
]
