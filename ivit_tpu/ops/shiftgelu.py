"""ShiftGELU: integer-only GELU via the sigmoid approximation.

``GELU(x) ≈ x · σ(1.702·x)``; the sigmoid is computed as a two-term
shift-exp softmax: ``σ(x) = e^{x−m} / (e^{x−m} + e^{−m})`` with
``m = max(x)`` over the last axis.

Reference: IntGELU
(/root/reference/models/quantization_utils/quant_modules.py:389-445) and
the Relay twin (/root/reference/TVM_benchmark/models/layers.py:389-403).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .interp import DEPLOY, Interp
from .shiftexp import exp_elisions, int_exp_shift

_I32_MAX = 2.0**31 - 1.0


def shiftgelu(
    q: jax.Array,
    scale: jax.Array,
    out_bits: int = 8,
    n: int = 23,
    interp: Interp = DEPLOY,
    static_p: int | None = None,
    stable: bool = False,
):
    """Integer GELU. Returns ``(q_out, scale_out)``,
    ``scale_out = scale / 2^(out_bits−1)``.

    ``static_p``: deploy-only hint — the host-known ``|⌊−1/(1.702·s)⌋|``
    for the *frozen* scale. Enables value-identical guard elisions
    (ops/shiftexp.exp_elisions) on the hot per-element chain; callers
    must guarantee the input is int8-valued (q ∈ [−128, 127], so
    q − max ≥ −255). None (QAT sim / dynamic scales) keeps every guard.

    ``stable``: elementwise-stable formulation — ``m = max(x, 0)`` per
    ELEMENT instead of the reference's row max (quant_modules.py:429).
    Since σ(x) = e^{x−m}/(e^{x−m} + e^{−m}) holds for any m, and with
    m = max(x, 0) exactly one exponent is zero per element, the whole
    sigmoid needs ONE shift-exp chain on −|x| plus the constant
    E₀ = exp_int(0) = p·2ⁿ: no cross-element reduce, no broadcast
    subtract, and the fc1→GELU→fc2-requant region becomes purely
    elementwise (one XLA fusion, no (B,N,4C) materialization between
    the reduce and its consumers). Value-DIFFERENT from the reference
    spec (different integer intermediates round differently), so SIM
    and DEPLOY must both run the same mode — it is a recorded model
    property like ``softmax_bits``, never an engine-side knob.
    """
    sig_scale = jax.lax.stop_gradient(scale) * 1.702

    if stable:
        neg_abs = jnp.minimum(q, -q)  # −|x| ≤ 0
        el_clamp, el_clip = exp_elisions(static_p, n, in_lo=-128.0)
        exp_int, _ = int_exp_shift(                            # e^(−|x|)
            neg_abs, sig_scale, n, interp,
            elide_clamp=el_clamp, elide_clip=el_clip,
        )
        x0 = jnp.floor(-1.0 / sig_scale)
        # exp_int(0): map(0)=0, qt=0, r=0 → ⌊−2x₀·2^(n−1)⌋ = p·2ⁿ
        # (exact in f32 for p·2ⁿ < 2³¹)
        e0 = (-x0) * (2.0**n)
        # E ≤ E₀ structurally (the chain is monotone on x ≤ 0), so the
        # sum is bounded by 2p·2ⁿ — statically elidable, and SOUND for
        # every input sign (the rowmax form's all-negative-row hazard
        # cannot occur: both exponents are ≤ 0 by construction).
        if static_p is not None and 2 * (static_p + 2) * 2.0**n <= _I32_MAX:
            exp_sum = exp_int + e0
        else:
            exp_sum = interp.clip(exp_int + e0, 1.0, _I32_MAX)
        factor = interp.floor(_I32_MAX / exp_sum)
        numer = jnp.where(q >= 0.0, e0, exp_int)
        sigmoid_int = interp.floor(numer * factor / 2.0 ** (32 - out_bits))
        q_out = q * sigmoid_int
        scale_out = scale * (1.0 / 2.0 ** (out_bits - 1))
        return q_out, scale_out

    q_max = jnp.max(q, axis=-1, keepdims=True)
    q_shifted = q - q_max

    el_clamp, el_clip = exp_elisions(static_p, n, in_lo=-255.0)
    exp_int, _ = int_exp_shift(                                # e^(x-max)
        q_shifted, sig_scale, n, interp,
        elide_clamp=el_clamp, elide_clip=el_clip,
    )
    exp_max, _ = int_exp_shift(-q_max, sig_scale, n, interp)   # e^(-max)
    # Sum clip: the LOWER bound is structurally dead (exp_int ≥
    # ⌊(p+1)/2⌋ ≥ 1 since r − 2x0 > p ≥ 1 at exponent ≥ −1, and
    # exp_max ≥ 0), so deploy elides it. The UPPER clip must stay
    # unconditionally: exp_max = shift-exp(−q_max) is only bounded by
    # p·2^n when q_max ≥ 0 — an all-negative row (q_max < 0, e.g. a
    # token whose FC1 outputs are all strongly negative) makes −q_max
    # positive, qt < 0, and exp_max saturates at 2^31−1, pushing the
    # unclipped sum past int32 (factor would floor to 0 instead of 1).
    if static_p is not None:
        exp_sum = jnp.minimum(exp_int + exp_max, _I32_MAX)
    else:
        exp_sum = interp.clip(exp_int + exp_max, 1.0, _I32_MAX)

    factor = interp.floor(_I32_MAX / exp_sum)
    sigmoid_int = interp.floor(exp_int * factor / 2.0 ** (32 - out_bits))

    q_out = q * sigmoid_int
    scale_out = scale * (1.0 / 2.0 ** (out_bits - 1))
    return q_out, scale_out
