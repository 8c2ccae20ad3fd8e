"""Straight-through-estimator primitives (jax.custom_vjp).

TPU-native analogues of the reference autograd Functions:
* ``floor_ste`` / ``round_ste``  — identity-gradient floor/round
  (/root/reference/models/quantization_utils/quant_utils.py:122-147).
* ``quantize`` — symmetric fake-quantization. The reference's
  SymmetricQuantFunction backward divides the gradient by the scale
  (/root/reference/models/quantization_utils/quant_utils.py:98-119);
  here that falls out of the chain rule automatically because the
  (stop-gradient) scale division happens *outside* the STE round.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .qtensor import int_range


@jax.custom_vjp
def round_ste(x):
    return jnp.round(x)


def _round_fwd(x):
    return jnp.round(x), None


def _round_bwd(_, g):
    return (g,)


round_ste.defvjp(_round_fwd, _round_bwd)


@jax.custom_vjp
def floor_ste(x):
    return jnp.floor(x)


def _floor_fwd(x):
    return jnp.floor(x), None


def _floor_bwd(_, g):
    return (g,)


floor_ste.defvjp(_floor_fwd, _floor_bwd)


def quantize(x: jax.Array, scale: jax.Array, bits: int) -> jax.Array:
    """Symmetric fake-quantize ``x`` to integers at ``scale``.

    Returns the integer values carried in float32 (QAT simulation).
    Gradient w.r.t. ``x`` is ``1/scale`` (STE through the round, clamp
    ignored) — the reference convention.

    ``scale`` must broadcast against ``x``; callers reshape per-channel
    weight scales to ``(C, 1)`` / per-tensor activation scales to ``()``
    before calling (the reference does this inside ``linear_quantize``,
    quant_utils.py:12-48; we keep broadcasting explicit at call sites).
    """
    lo, hi = int_range(bits)
    scale = jax.lax.stop_gradient(scale)
    q = round_ste(x / scale)
    # Clamp without masking gradients: the reference backward is an
    # unconditional grad/scale (quant_utils.py:98-119). Exact residue
    # form (value ≡ clip(q) even for |q| ≫ hi, where the naive
    # q + sg(clip−q) form cancels in f32 — see ops/interp.Interp.clip).
    return jax.lax.stop_gradient(jnp.clip(q, lo, hi)) + (
        q - jax.lax.stop_gradient(q)
    )
