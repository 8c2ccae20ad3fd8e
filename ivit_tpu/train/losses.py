"""Loss functions.

Covers the reference's criterion selection
(/root/reference/quant_train.py:207-214): SoftTargetCrossEntropy when
mixup is active, LabelSmoothingCrossEntropy when smoothing > 0, plain CE
otherwise — and the DeiT-style DistillationLoss wrapper
(/root/reference/utils/train_utils.py:6-66).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels, smoothing: float = 0.0):
    """CE with optional label smoothing over integer labels."""
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    if smoothing > 0.0:
        # timm convention: (1-ε)·nll + ε·mean(-logp).
        on = 1.0 - smoothing
        off = smoothing / n
        nll = -(on * jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
                + off * jnp.sum(logp, axis=-1))
    else:
        nll = -jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
    return jnp.mean(nll)


def soft_target_cross_entropy(logits, targets):
    """CE against soft targets (mixup/cutmix path)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(jnp.sum(-targets * logp, axis=-1))


def distillation_loss(
    student_logits,
    base_loss,
    teacher_logits=None,
    kind: str = "none",
    alpha: float = 0.5,
    tau: float = 1.0,
):
    """DeiT distillation: soft (T²-scaled KL) or hard (teacher argmax CE).

    With ``kind='none'`` or no teacher, returns ``base_loss`` unchanged
    (the reference's default: distillation-type none,
    quant_train.py never wires a teacher).
    """
    if kind == "none" or teacher_logits is None:
        return base_loss
    if kind == "soft":
        t = jax.nn.softmax(teacher_logits / tau, axis=-1)
        logp = jax.nn.log_softmax(student_logits / tau, axis=-1)
        kl = jnp.mean(jnp.sum(t * (jnp.log(jnp.maximum(t, 1e-12)) - logp), -1))
        distill = kl * tau * tau
    elif kind == "hard":
        distill = cross_entropy(
            student_logits, jnp.argmax(teacher_logits, axis=-1)
        )
    else:
        raise ValueError(f"unknown distillation kind {kind!r}")
    return base_loss * (1 - alpha) + distill * alpha


def topk_accuracy(logits, labels, k: int = 1):
    """Top-k accuracy in [0, 100] (timm ``accuracy`` analogue,
    used at /root/reference/quant_train.py:334)."""
    topk = jnp.argsort(logits, axis=-1)[:, -k:]
    hit = jnp.any(topk == labels[:, None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32)) * 100.0
