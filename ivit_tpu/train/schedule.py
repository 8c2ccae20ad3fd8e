"""LR schedules.

Reproduces the reference recipe: timm cosine scheduler with linear
warmup, ``min_lr = lr / 15`` (/root/reference/quant_train.py:78-102,202).
"""

from __future__ import annotations

import optax


def cosine_schedule(
    base_lr: float,
    steps_per_epoch: int,
    epochs: int,
    warmup_epochs: int = 5,
    warmup_lr: float = 1e-6,
    min_lr: float | None = None,
):
    """Linear warmup → cosine decay to ``min_lr`` (default lr/15)."""
    if min_lr is None:
        min_lr = base_lr / 15.0
    warmup_steps = max(1, warmup_epochs * steps_per_epoch)
    total = max(warmup_steps + 1, epochs * steps_per_epoch)
    return optax.warmup_cosine_decay_schedule(
        init_value=min(warmup_lr, base_lr),
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total,
        end_value=min_lr,
    )
