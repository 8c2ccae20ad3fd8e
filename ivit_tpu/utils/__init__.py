from .metrics import AverageMeter, MetricLogger
from .compile_cache import enable_compile_cache
from .profile_env import profile_model_kwargs
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
    "enable_compile_cache",
    "profile_model_kwargs",
    "save_checkpoint",
    "load_checkpoint",
    "load_checkpoint_raw",
    "save_artifact",
    "load_artifact",
]
