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


def gelu_int_lanes_valid(static_p: int | None, n: int = 23) -> bool:
    """Host gate for :func:`shiftgelu_stable_int_deploy` — all the
    conditions under which the int32-lane twin is PROVABLY bit-identical
    to the f32-carrier stable spec (see that function's docstring)."""
    if static_p is None:
        return False
    _, el_clip = exp_elisions(static_p, n, in_lo=-128.0)
    # (the input clamp is NOT a gate: the twin always applies it as one
    # native max — value-neutral when the f32 side elides it, identical
    # when it keeps it)
    return (
        el_clip
        and 2 * (static_p + 2) * 2.0**n <= _I32_MAX  # sum-clip elision
        and n * static_p * static_p <= 2**26         # magic-div exactness
    )


def shiftgelu_stable_int_deploy(
    q: jax.Array,
    scale: jax.Array,
    out_bits: int = 8,
    n: int = 23,
    static_p: int | None = None,
):
    """Int32-lane deploy twin of the *stable* ShiftGELU — **bit-identical**
    to the f32-carrier spec whenever :func:`gelu_int_lanes_valid` holds
    (callers must gate on it; asserts here guard misuse).

    Why it is exact (every f32-spec rounding is reproduced):

    * the log2(e) map, quotient/remainder and 2^(n−1−qt) scaling stay
      below 2^24 in operand mantissas, so the f32 arithmetic there is
      integer-exact and native shifts/adds reproduce it (``q>>k`` is
      floor division for the negative inputs, matching ``floor(q/2^k)``;
      ``((r−2x0)<<(n−1))>>qt`` covers the qt = n half-shift case the
      f32 path handles via exp2(−1) = 0.5);
    * ``⌊t/x0⌋`` by magic multiply-high ``(u·M)>>26`` with
      ``M = ⌈2^26/p⌉`` is the exact floor for u ≤ n·p when n·p² ≤ 2^26,
      and the f32 division the spec performs cannot round across an
      integer boundary there (distance ≥ 1/p ≫ ulp(t/x0) at t/x0 ≤ n),
      so exact == f32-div+floor;
    * ``exp_sum``: both f32 addends (e, e0 = p·2^n) are exactly
      representable, so the spec's f32 add is RN(exact sum) — identical
      to converting the exact int32 sum, which is how it is computed
      here; the tail (factor division by the f32-rounded 2^31−1,
      numer·factor product rounding, 2^(32−out_bits) scaling, final
      multiply by q) is executed in f32 exactly as the spec writes it.

    Why it is faster: the per-element head runs as native int32 VPU
    shifts/adds — no f32 floors, no divide, no ldexp reconstruction.
    Measured on v5e at the DeiT-S MLP shape before wiring the engine
    knob (scripts/bench_gelu_modes.py).
    """
    assert static_p is not None and gelu_int_lanes_valid(static_p, n)
    sig_scale = jnp.asarray(scale, jnp.float32) * 1.702
    qi = q.astype(jnp.int32)
    neg = jnp.minimum(qi, -qi)                       # −|x| ≤ 0
    t = neg + (neg >> 1) - (neg >> 4)                # ⌊·log2 e⌋ map
    x0f = jnp.floor(-1.0 / sig_scale)                # same f32 ops as spec
    x0i = x0f.astype(jnp.int32)
    t = jnp.maximum(t, jnp.int32(n) * x0i)           # see gate docstring
    p = -x0i
    m = (jnp.int32(1 << 26) + p - 1) // p            # scalar ⌈2^26/p⌉
    u = -t                                           # in [0, n·p]
    qt = (u * m) >> 26
    r = t - x0i * qt
    e = ((r - 2 * x0i) << (n - 1)) >> qt             # in (0, p·2^n]
    e0 = p << n                                      # exp_int(0)
    exp_sum = (e + e0).astype(jnp.float32)           # RN == spec's f32 add
    factor = jnp.floor(_I32_MAX / exp_sum)
    numer = jnp.where(qi >= 0, e0, e).astype(jnp.float32)
    sigmoid_int = jnp.floor(numer * factor / 2.0 ** (32 - out_bits))
    q_out = q * sigmoid_int
    scale_out = scale * (1.0 / 2.0 ** (out_bits - 1))
    return q_out, scale_out


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
