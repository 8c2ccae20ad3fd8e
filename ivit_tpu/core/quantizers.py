"""Scale computation for symmetric quantization.

Mirrors ``symmetric_linear_quantization_params``
(/root/reference/models/quantization_utils/quant_utils.py:51-69) and the
per-out-channel weight min/max reduction recomputed every forward pass
(/root/reference/models/quantization_utils/quant_modules.py:68-80).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def symmetric_scale(min_val: jax.Array, max_val: jax.Array, bits: int) -> jax.Array:
    """``scale = max(|min|, max) / (2^(b-1)-1)``, clamped to f32 eps.

    No gradient flows through scale computation (reference wraps it in
    ``torch.no_grad()``).
    """
    n = 2 ** (bits - 1) - 1
    max_abs = jnp.maximum(-min_val, max_val)
    scale = max_abs.astype(jnp.float32) / float(n)
    return jax.lax.stop_gradient(jnp.maximum(scale, _F32_EPS))


def per_channel_minmax(w: jax.Array):
    """Per-out-channel (first axis) min/max of a weight tensor.

    The reference reshapes weights to ``(out, -1)`` and reduces axis 1
    (quant_modules.py:70-75). Our linear kernels are stored ``(in, out)``
    (JAX convention), so callers pass the kernel transposed view; conv
    kernels pass ``(out, -1)``.
    """
    v = w.reshape(w.shape[0], -1)
    return jnp.min(v, axis=1), jnp.max(v, axis=1)


def weight_scale(w_out_first: jax.Array, bits: int) -> jax.Array:
    """Per-out-channel symmetric scale, recomputed from current weights."""
    mn, mx = per_channel_minmax(w_out_first)
    return symmetric_scale(mn, mx, bits)
