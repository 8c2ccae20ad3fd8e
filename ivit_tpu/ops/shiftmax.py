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
    q_max: jax.Array | None = None,
    split_normalize: bool = False,
):
    """Integer softmax over the last axis.

    ``mask``: optional additive integer-domain mask (already divided by
    ``scale``), used by Swin's shifted-window attention where the
    reference adds a float −100 mask before softmax (swin_quant.py:151-155).

    ``q_max``: optional precomputed row max of ``q`` (..., 1). The deploy
    engine hoists the max over the *pre-requant* int32 logits — exact,
    since requantization with a positive scalar ratio is monotone — so
    the row reduce fuses into the producing matmul and no wide-carrier
    tensor is ever materialized. Value-identical to the internal max.
    Not valid together with ``mask``.

    Returns ``(q_out, scale_out)`` with ``scale_out = 1/2^(out_bits−1)``.
    """
    if mask is not None:
        assert q_max is None, "precomputed q_max cannot see the mask"
        q = q + mask
    if q_max is None:
        q_max = jnp.max(q, axis=-1, keepdims=True)
    q = q - q_max

    exp_int, _ = int_exp_shift(q, scale, n, interp)
    exp_sum = _exact_sum_lastdim(exp_int, interp)
    exp_sum = interp.clip(exp_sum, 1.0, _I32_MAX)

    factor = interp.floor(_I32_MAX / exp_sum)

    if split_normalize:
        # Deploy perf knob, value-identical: evaluate the shift-exp a
        # second time for the normalize step, seeded from an opaque copy
        # of the scale (optimization_barrier) so XLA cannot CSE it with
        # the sum's copy — a reshaped view gets canonicalized away and
        # re-merged. Each evaluation then fuses into its consumer (the
        # row-sum reduce / the @V matmul) and the wide exp tensor is
        # never materialized to HBM. Safe because the row sum above is
        # order-independent (exact hi/lo split): the two evaluations
        # are elementwise with bit-equal results in any fusion context.
        scale2 = jax.lax.optimization_barrier(jnp.asarray(scale, jnp.float32))
        exp_int, _ = int_exp_shift(q, scale2, n, interp)

    q_out = interp.floor(exp_int * factor / 2.0 ** (32 - out_bits))
    scale_out = jnp.asarray(1.0 / 2.0 ** (out_bits - 1), jnp.float32)
    return q_out, scale_out


def _exact_sum_lastdim(exp_int: jax.Array, interp: Interp) -> jax.Array:
    """Order-independent exact row sum of shift-exp values.

    A plain f32 reduce rounds once partial sums pass 2^24, making the
    result depend on XLA's reduction order — sim and deploy compile
    different fusion contexts, so their sums can drift on TPU (the
    round-1 residual-parity class). Split each value at 2^16: both
    partial sums stay below 2^24 for any row length ≤ 2^8 and
    ``|x0| < 2^16`` (activation scales are far above 2^-16), so every
    f32 add is exact in any order; the single recombining add rounds
    deterministically. This also lands closer to the reference's TVM
    deploy semantics, which accumulates in int32 exactly
    (/root/reference/TVM_benchmark/models/layers.py:372-386).
    """
    hi = interp.floor(exp_int * (1.0 / 2.0**16))
    lo = exp_int - hi * (2.0**16)
    hi_sum = jnp.sum(hi, axis=-1, keepdims=True)
    lo_sum = jnp.sum(lo, axis=-1, keepdims=True)
    return hi_sum * (2.0**16) + lo_sum
