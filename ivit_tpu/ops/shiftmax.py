"""Shiftmax: integer-only softmax.

Max-subtracted shift-exp, integer normalization by
``factor = floor((2^31−1)/Σexp)``, output at the fixed scale
``1/2^(bits−1)``.

Reference: IntSoftmax
(/root/reference/models/quantization_utils/quant_modules.py:448-497).
ViT instantiates it with 16-bit output (vit_quant.py:54), Swin with
8-bit (swin_quant.py:108).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .interp import DEPLOY, Interp
from .shiftexp import int_exp_shift

_I32_MAX = 2.0**31 - 1.0


def shiftmax(
    q: jax.Array,
    scale: jax.Array,
    out_bits: int = 8,
    n: int = 15,
    interp: Interp = DEPLOY,
    mask: jax.Array | None = None,
):
    """Integer softmax over the last axis.

    ``mask``: optional additive integer-domain mask (already divided by
    ``scale``), used by Swin's shifted-window attention where the
    reference adds a float −100 mask before softmax (swin_quant.py:151-155).

    Returns ``(q_out, scale_out)`` with ``scale_out = 1/2^(out_bits−1)``.
    """
    if mask is not None:
        q = q + mask
    q = q - jnp.max(q, axis=-1, keepdims=True)

    exp_int, _ = int_exp_shift(q, scale, n, interp)
    exp_sum = jnp.sum(exp_int, axis=-1, keepdims=True)
    exp_sum = interp.clip(exp_sum, 1.0, _I32_MAX)

    factor = interp.floor(_I32_MAX / exp_sum)
    q_out = interp.floor(exp_int * factor / 2.0 ** (32 - out_bits))
    scale_out = jnp.asarray(1.0 / 2.0 ** (out_bits - 1), jnp.float32)
    return q_out, scale_out
