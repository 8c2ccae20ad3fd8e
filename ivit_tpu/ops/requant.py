"""Fixed-point requantization (the reference's ``fixedpoint_mul``).

Given integer values ``q`` at scale ``s_in``, produce integer values at
scale ``s_out``, optionally folding in a residual branch held at a third
scale — the reference's dual-scale residual merge
(/root/reference/models/quantization_utils/quant_utils.py:178-253, used
at every residual junction, vit_quant.py:135,141).

Canonical mode multiplies by the float32 ratio (see core/dyadic.py for
why this is the TPU-native spec); ``strict_dyadic`` reproduces pure
integer multiply+shift arithmetic for integer-only hardware semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.dyadic import dyadic_requant
from ..core.qtensor import int_range
from .interp import DEPLOY, Interp


def requantize(
    q: jax.Array,
    s_in: jax.Array,
    s_out: jax.Array,
    bits: int,
    identity_q: Optional[jax.Array] = None,
    identity_scale: Optional[jax.Array] = None,
    interp: Interp = DEPLOY,
    strict_dyadic: bool = False,
) -> jax.Array:
    """Requantize ``q`` from ``s_in`` to ``s_out`` with optional residual add.

    Gradient conventions (sim mode) match the reference: the output scale
    is a no-grad quantity, but ``s_in`` flows through differentiably —
    LayerNorm's γ reaches the loss via its output scale
    (quant_modules.py:383-384), and STE passes gradients through the
    round and the clamp (quant_utils.py:255-261).
    """
    s_out = jax.lax.stop_gradient(s_out)
    r = (s_in / s_out).astype(jnp.float32)

    if strict_dyadic and not interp.is_sim:
        out = dyadic_requant(q.astype(jnp.int32), r).astype(jnp.float32)
    else:
        out = interp.round(q * r)

    if identity_q is not None:
        r_id = (identity_scale / s_out).astype(jnp.float32)
        if strict_dyadic and not interp.is_sim:
            out = out + dyadic_requant(
                identity_q.astype(jnp.int32), r_id
            ).astype(jnp.float32)
        else:
            out = out + interp.round(identity_q * r_id)

    lo, hi = int_range(bits)
    return interp.clip(out, lo, hi)
