"""jit-compiled train / eval steps.

The analogues of the reference's per-batch loops
(/root/reference/quant_train.py:266-311 train, :314-351 validate), minus
the AMP loss-scaler (irrelevant on TPU: gradients stay f32/bf16 under
XLA, there is no fp16 underflow regime to scale around).

``train=True`` runs the model with EMA range updates (the reference's
``unfreeze_model``), eval runs frozen ranges (``freeze_model``,
/root/reference/models/model_utils.py:5-40).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from .losses import soft_target_cross_entropy, topk_accuracy
from .state import TrainState


def make_train_step(
    model,
    ema_decay: float = 0.0,
    grad_clip: Optional[float] = None,
):
    """Build a pure train step: (state, images, soft_targets, rng) → state, metrics.

    Targets are soft (mixup or smoothed one-hot) — the caller prepares
    them, mirroring the reference where the criterion choice follows the
    augmentation config (quant_train.py:207-214).
    """

    def train_step(state: TrainState, images, targets, rng):
        def loss_fn(params):
            logits, updated = model.apply(
                {"params": params, "quant_stats": state.quant_stats},
                images,
                train=True,
                mutable=["quant_stats"],
                rngs={"dropout": rng},
            )
            return soft_target_cross_entropy(logits, targets), (logits, updated)

        (loss, (logits, updated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)

        updates, opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                ema_params,
                params,
            )

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            quant_stats=updated["quant_stats"],
            opt_state=opt_state,
            ema_params=ema_params,
        )
        metrics = {
            "loss": loss,
            "acc1": topk_accuracy(logits, jnp.argmax(targets, -1), 1),
        }
        return new_state, metrics

    return train_step


def make_eval_step(model, return_logits: bool = False):
    """Frozen-range eval step: (variables, images, labels, n_valid) → metrics.

    ``n_valid`` masks rows padded on by the caller to reach a
    batch-size multiple of the mesh — padded duplicates must not
    contaminate the accuracy mean (they would bias best-checkpoint
    selection on val sets whose size is not a batch multiple).

    ``return_logits``: also return the forward's logits (metrics,
    logits) — the ``--dump-logits`` path reuses the eval forward
    instead of dispatching a second full-model apply per batch (which
    doubled eval wall-clock through the TPU relay).
    """

    def eval_step(variables, images, labels, n_valid):
        logits = model.apply(variables, images, train=False)
        valid = (
            jnp.arange(labels.shape[0]) < n_valid
        ).astype(jnp.float32)

        def acc(k):
            topk = jnp.argsort(logits, axis=-1)[:, -k:]
            hit = jnp.any(topk == labels[:, None], axis=-1)
            return jnp.sum(hit * valid) / n_valid * 100.0

        metrics = {"acc1": acc(1), "acc5": acc(5)}
        if return_logits:
            return metrics, logits
        return metrics

    return eval_step
