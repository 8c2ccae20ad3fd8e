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

Mean and variance are computed **order-independently exactly** in one
pass over the data (int32 lanes; the expanded identity
``Σ(q−m)² = Σq² − 2mΣq + Dm²`` with ``Σq²`` carried as an exact hi/lo
pair). A plain f32 reduce rounds order-dependently above 2^24, so the
simulator and the deploy engine — compiled in different fusion
contexts — could drift on TPU (the round-1 residual-parity class).
Here every reduce is exact for 16-bit carriers and D ≤ 8192, and the
few recombining f32 roundings are a fixed expression tree, identical in
both interpreters. This also matches the reference's TVM deploy side,
which accumulates LayerNorm statistics in integer registers exactly
(layers.py:329-350); the reference's torch QAT side rounds in f32 —
one more of the sim↔deploy drifts this rebuild removes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .interp import DEPLOY, Interp

_I32_MAX = 2.0**31 - 1.0
_NEWTON_ITERS = 10


def _exact_stats(q: jax.Array, carrier_bound: int = 2**15):
    """One-pass (Σq, Σq²) over the last axis in exact int32 lanes.

    Exact partial sums for integer-valued ``q`` with |q| ≤
    ``carrier_bound`` (default 2^15 — the bound int_layernorm's callers
    clip to) and row length ≤ 8192 (Σq ≤ 2^28 fits int32; int32 q·q
    would wrap for |q| > 46340, so the factors are split at 8 bits:
    q² = a²·2^16 + 2ab·2^8 + b² with a = q≫8, b = q&255). Short rows
    merge the a² and ab accumulators — q² = (a²·2^7 + ab)·2^9 + b², one
    fewer lane reduce; |Σ(a²·2^7 + ab)| ≤ d·(A²·2^7 + A·2^8) with
    A = carrier_bound/2^8 stays in int32 exactly for d ≤ 1008 at the
    default bound — the merge threshold is DERIVED from
    ``carrier_bound`` so a wider-carrier caller gets the safe split
    automatically instead of silently wrapping int32. The recombine
    into f32 (Σq² itself can exceed 2^24) rounds deterministically: a
    fixed expression tree, chosen statically by row length, identical
    in SIM and DEPLOY.
    """
    d = q.shape[-1]
    big_a = max(carrier_bound >> 8, 1)
    # split-path validity: Σa² ≤ d·A² must itself fit int32
    assert d * big_a * big_a < 2**31, (
        f"_exact_stats: d={d} at carrier_bound={carrier_bound} "
        "overflows even the split accumulators"
    )
    merge_limit = (2**31 - 1) // (big_a * big_a * 128 + big_a * 256)
    qi = q.astype(jnp.int32)
    a = qi >> 8
    b = qi & 255
    s_q = jnp.sum(qi, axis=-1, keepdims=True)
    s_bb = jnp.sum(b * b, axis=-1, keepdims=True)
    if d <= min(1000, merge_limit):
        s_t = jnp.sum(a * a * 128 + a * b, axis=-1, keepdims=True)
        sq2 = s_t.astype(jnp.float32) * (2.0**9) + s_bb.astype(
            jnp.float32
        )
    else:
        s_aa = jnp.sum(a * a, axis=-1, keepdims=True)
        s_ab = jnp.sum(a * b, axis=-1, keepdims=True)
        sq2 = (
            s_aa.astype(jnp.float32) * (2.0**16)
            + s_ab.astype(jnp.float32) * (2.0**9)
            + s_bb.astype(jnp.float32)
        )
    return s_q, sq2


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
    assert d <= 8192, "exact int32 LayerNorm stats need row length <= 8192"
    base_scale = math.sqrt(d) / 2.0**30

    qs = jax.lax.stop_gradient(q)
    s_q, sq2 = _exact_stats(qs)
    sum_f = s_q.astype(jnp.float32)  # ≤ 2^29: one deterministic rounding
    mean_val = jnp.round(sum_f / d)
    # var = Σq² − 2mΣq + Dm² (fixed expression tree, deterministic)
    var_val = sq2 - 2.0 * mean_val * sum_f + d * mean_val * mean_val
    var_val = jnp.maximum(var_val, 0.0)  # guard f32 cancellation

    if interp.is_sim:
        # Differentiable twin + STE correction: forward takes the exact
        # values, gradients flow through the float formulation (the
        # reference's autograd path, quant_modules.py:359-363).
        # exact residue form: value ≡ the exact-stat quantity bit-for-
        # bit regardless of magnitude (see ops/interp.Interp.clip)
        mean_f = interp.round(jnp.mean(q, axis=-1, keepdims=True))
        mean = jax.lax.stop_gradient(mean_val) + (
            mean_f - jax.lax.stop_gradient(mean_f)
        )
        y = q - mean
        var_f = jnp.sum(y * y, axis=-1, keepdims=True)
        var = jax.lax.stop_gradient(var_val) + (
            var_f - jax.lax.stop_gradient(var_f)
        )
    else:
        mean = mean_val
        y = q - mean
        var = var_val

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
