from .state import TrainState, create_train_state
from .steps import make_train_step, make_eval_step
from .losses import (
    cross_entropy,
    soft_target_cross_entropy,
    distillation_loss,
)
from .schedule import cosine_schedule
from .augment import mixup_cutmix

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "cross_entropy",
    "soft_target_cross_entropy",
    "distillation_loss",
    "cosine_schedule",
    "mixup_cutmix",
]
