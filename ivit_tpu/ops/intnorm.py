"""I-LayerNorm: integer-only LayerNorm with Newton integer square root.

Integer mean/variance over the last axis; standard deviation via ten
Newton iterations ``k ← (k + ⌊var/k⌋)/2`` seeded at ``2^16``; normalize
by ``factor = ⌊(2^31−1)/std⌋``. The affine γ folds into the output
scale, β folds into an integer bias — the output is therefore held at a
*per-channel* scale ``γ·√D/2^30``.

Reference: IntLayerNorm
(/root/reference/models/quantization_utils/quant_modules.py:333-386) and
the Relay twin (/root/reference/TVM_benchmark/models/layers.py:329-350).
Note LayerNorm is scale-invariant: the input scale cancels and is not
consumed (the reference likewise never reads it after forming x_int).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .interp import DEPLOY, Interp

_I32_MAX = 2.0**31 - 1.0
_NEWTON_ITERS = 10


def int_layernorm(
    q: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    interp: Interp = DEPLOY,
):
    """Integer LayerNorm over the last axis.

    Returns ``(q_out, scale_out)`` where ``scale_out = γ·√D/2^30`` is
    per-channel and differentiable w.r.t. γ (the reference multiplies the
    live γ into the scale, quant_modules.py:383; β is detached,
    quant_modules.py:377).
    """
    d = q.shape[-1]
    base_scale = math.sqrt(d) / 2.0**30

    mean = interp.round(jnp.mean(q, axis=-1, keepdims=True))
    y = q - mean
    var = jnp.sum(y * y, axis=-1, keepdims=True)

    # Integer Newton iteration for floor(sqrt(var)), seeded at 2^16.
    k = jnp.full_like(var, 2.0**16)
    for _ in range(_NEWTON_ITERS):
        k = interp.floor((k + interp.floor(var / k)) / 2.0)
    std = jnp.maximum(k, 1.0)

    factor = interp.floor(_I32_MAX / std)
    y = interp.floor(y * factor / 2.0)

    bias_int = jnp.floor(
        jax.lax.stop_gradient(beta / gamma) / base_scale
    )
    q_out = y + bias_int
    scale_out = gamma * base_scale
    return q_out, scale_out
