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

import math

import jax
import jax.numpy as jnp

from .interp import DEPLOY, Interp
from .shiftexp import exp_elisions, int_exp_shift

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
    static_p: int | None = None,
    in_lo: float = -255.0,
    packed_exp: bool = False,
    col_valid: jax.Array | None = None,
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

    ``static_p``: deploy-only hint — host-known ``|⌊−1/scale⌋|`` of the
    frozen scale. Enables value-identical guard elisions on the hot
    chain (ops/shiftexp.exp_elisions; requires an int8-valued input, so
    only legal with ``mask=None``) and, when ``N·p·2^n`` fits int32, an
    int32 row sum that equals the hi/lo-split f32 sum bit-for-bit (both
    produce the exact integer sum and round once at the same point).

    ``packed_exp``: deploy-only HBM-traffic knob, **value-identical**.
    The shift-exp value has at most ``⌈log2(2p)⌉ ≤ 12`` significant
    bits: ``exp = m·2^(k−1)`` with ``m = r − 2x0 ∈ (p, 2p]`` and
    ``k = n − qt ∈ [0, n]``. The two softmax passes (exp+row-sum, then
    ``⌊exp·factor⌋`` — the factor needs the finished sum, so XLA must
    materialize the boundary tensor) normally hand a 4-byte f32 ``exp``
    across HBM; with ``packed_exp`` the boundary is instead the u16
    ``k·4096 + m`` (encode is free — ``m``/``k`` are chain
    intermediates; an optimization_barrier stops XLA re-deriving f32
    exp across it) and the consumer decodes with a few int/f32 ops.
    Bit-identity of the decode: for ``k ≥ 1``, ``m·2^(k−1)`` is exact
    in f32 (≤12 mantissa bits) so the spec's inner floor is a no-op and
    ``⌊(m·factor)·2^(k−1)⌋ = ⌊(m·2^(k−1))·factor⌋`` because scaling by
    a power of two is exact and commutes with f32 rounding; for
    ``k = 0`` the inner ``⌊m/2⌋`` binds, so the encoder packs
    ``m′ = 2⌊m/2⌋`` (value-identical by the same argument applied to
    ``m′/2``). Requires ``static_p ≤ 2045`` (``m ≤ 2p + 2 < 2^12``)
    and ``n ≤ 15`` (``k`` fits 4 bits); silently falls back to the
    plain path otherwise. Mutually exclusive with ``split_normalize``.

    ``col_valid``: optional bool mask over the last axis marking real
    columns (the win-pad engine probe pads Swin's N=49 windows to a
    tile-friendly size). Invalid columns' exp values are zeroed exactly
    — the same multiplicative mask the fused window kernel uses
    (kernels/_shiftmax_common.shift_exp_rows) — so the row sum and the
    valid outputs are bit-identical to the unpadded call. The caller
    must pre-set invalid inputs to a large negative sentinel (so the
    row max is unaffected) and pass ``in_lo=-inf`` (the sentinel breaks
    the int8-domain elision proofs).

    Returns ``(q_out, scale_out)`` with ``scale_out = 1/2^(out_bits−1)``.
    """
    if col_valid is not None:
        assert q_max is None and not packed_exp and not split_normalize
        assert math.isinf(in_lo) and in_lo < 0, (
            "col_valid inputs carry a sentinel below the int8 domain"
        )
    if mask is not None:
        assert q_max is None, "precomputed q_max cannot see the mask"
        # the additive mask breaks the int8 domain bound: the range
        # clamp must stay (clip elision + int32 sum depend only on p)
        in_lo = -math.inf
        q = q + mask
    if q_max is None:
        q_max = jnp.max(q, axis=-1, keepdims=True)
    q_in = q
    q = q - q_max

    el_clamp, el_clip = exp_elisions(static_p, n, in_lo=in_lo)
    use_packed = (
        packed_exp
        and not interp.is_sim
        and mask is None
        # in_lo = -inf marks a pre-masked (non-integral) input — e.g.
        # the Swin engine adds the f32 SW-MSA mask before calling with
        # mask=None — which breaks the integer (m, k) decomposition
        and math.isfinite(in_lo)
        and static_p is not None
        and static_p <= 2045
        and n <= 15
        and el_clip  # always true under the p gate; asserts the proof
    )
    if use_packed:
        assert not split_normalize, "packed_exp excludes split_normalize"
        # Inline int_exp_shift so the pack can reuse its intermediates
        # (every op below is textually the DEPLOY chain from
        # ops/shiftexp.int_exp_shift — same expressions, same order).
        scale_f = jax.lax.stop_gradient(jnp.asarray(scale, jnp.float32))
        qc = q + interp.floor(q / 2.0) - interp.floor(q / 16.0)
        x0 = jnp.floor(-1.0 / scale_f)
        if not el_clamp:
            qc = jnp.maximum(qc, n * x0)
        qt = interp.floor(qc / x0)
        r = qc - x0 * qt
        m = r - 2.0 * x0                 # integer-valued, in (p, 2p]
        k = float(n) - qt                # integer-valued, in [0, n]
        exp_int = interp.floor(m * interp.exp2(k - 1.0))
        # k = 0 is the one case where the spec's inner floor binds
        # (exp = ⌊m/2⌋): fold it into the packed mantissa so the
        # decoder is branch-free.
        m_packed = jnp.where(k > 0.5, m, interp.floor(m * 0.5) * 2.0)
        packed = (k * 4096.0 + m_packed).astype(jnp.uint16)
    else:
        exp_int, _ = int_exp_shift(
            q, scale, n, interp, elide_clamp=el_clamp, elide_clip=el_clip
        )
    if col_valid is not None:
        exp_int = jnp.where(col_valid, exp_int, 0.0)
    if (
        static_p is not None
        and not interp.is_sim
        # N ≤ 256 keeps the hi/lo-split twin single-rounding (longer
        # rows take the 3-limb tree, which rounds differently — the
        # int32 sum must only replace the tree it bit-matches)
        and q.shape[-1] <= 256
        and q.shape[-1] * (static_p + 2) * 2.0**n < 2.0**31
    ):
        exp_sum = jnp.sum(
            exp_int.astype(jnp.int32), axis=-1, keepdims=True
        ).astype(jnp.float32)
    else:
        exp_sum = _exact_sum_lastdim(exp_int, interp)
    exp_sum = interp.clip(exp_sum, 1.0, _I32_MAX)

    # fold the final 2^-(32-bits) shift into the per-row factor: f32
    # scaling by a power of two is exact, so ⌊e·f/2^k⌋ ≡ ⌊e·(f·2^-k)⌋
    # bit-for-bit — one fewer multiply on the wide tensor.
    factor = interp.floor(_I32_MAX / exp_sum) * (
        1.0 / 2.0 ** (32 - out_bits)
    )

    if use_packed:
        # The barrier forces the u16 to BE the pass boundary: without
        # it XLA would CSE the decode with the (cheaper-looking) f32
        # exp_int above and materialize 4 bytes/element again.
        pi = jax.lax.optimization_barrier(packed).astype(jnp.int32)
        kf = (pi >> 12).astype(jnp.float32)
        mf = (pi & 0xFFF).astype(jnp.float32)
        q_out = interp.floor((mf * factor) * interp.exp2(kf - 1.0))
        scale_out = jnp.asarray(1.0 / 2.0 ** (out_bits - 1), jnp.float32)
        return q_out, scale_out

    if split_normalize:
        # Deploy perf knob, value-identical: evaluate the max-subtract
        # and shift-exp a second time for the normalize step, seeded
        # from opaque copies of the (tiny) row max and scale
        # (optimization_barrier) so XLA cannot CSE the wide chain with
        # the sum's copy and materialize it. Each evaluation then fuses
        # into its consumer (the row-sum reduce / the @V matmul) and no
        # wide f32 tensor reaches HBM. Safe because the row sum above
        # is order-independent (exact hi/lo split): the duplicated ops
        # are elementwise with bit-equal results in any fusion context.
        q2 = q_in - jax.lax.optimization_barrier(q_max)
        scale2 = jax.lax.optimization_barrier(jnp.asarray(scale, jnp.float32))
        exp_int, _ = int_exp_shift(q2, scale2, n, interp)

    q_out = interp.floor(exp_int * factor)
    scale_out = jnp.asarray(1.0 / 2.0 ** (out_bits - 1), jnp.float32)
    return q_out, scale_out


def shiftmax_int_deploy(
    q: jax.Array,
    scale: jax.Array,
    out_bits: int = 8,
    n: int = 15,
):
    """Int32-lane deploy twin of :func:`shiftmax` — **bit-identical**
    to the f32-carrier spec whenever ``|x0| = |⌊−1/scale⌋| ≤ 512``.

    Why it is exact: with n = 15 and p = |x0| ≤ 2^9, every quantity in
    the f32 spec stays below 2^24 (exp ≤ p·2^n ≤ 2^24, products at the
    boundary are exactly representable), so the f32 arithmetic is
    integer-exact and an int32 evaluation reproduces it bit-for-bit.
    The row sum uses the same hi/lo-at-2^16 split and single f32
    recombine as :func:`_exact_sum_lastdim`, so the one rounding that
    exists is identical.

    Why it is faster: the VPU chain is shifts/adds instead of f32
    floors, the ⌊q/x0⌋ division becomes one multiply-high by a
    runtime-computed magic constant (M = ⌈2^26/p⌉; exact for
    u ≤ n·p since u·(pM − 2^26) < u·p ≤ n·p² ≤ 2^26 ⇒ the added
    fraction is < n·p/2^26 < 1/p, below the distance to the next
    integer), and ``2^(n−1−qt)`` is a native variable shift
    (``v << (n − qt) >> 1`` also covers the qt = n right-shift case).

    No mask support (Swin's additive mask is non-integral); callers
    gate on the host-side scale with margin (p ≤ 500) AND on row
    length ≤ 256 (the hi/lo partial sums are only cast-exact below
    2^24; a longer row takes _exact_sum_lastdim's 3-limb tree, which
    this twin does not reproduce).
    """
    assert q.shape[-1] <= 256, (
        f"shiftmax_int_deploy requires rows <= 256, got {q.shape[-1]}"
    )
    qi = q.astype(jnp.int32)
    q_max = jnp.max(qi, axis=-1, keepdims=True)
    u0 = qi - q_max  # <= 0

    x0f = jnp.floor(-1.0 / jnp.asarray(scale, jnp.float32))
    x0i = x0f.astype(jnp.int32)  # negative
    p = -x0i
    m = (jnp.int32(1 << 26) + p - 1) // p  # scalar ceil(2^26/p)

    qln = u0 + (u0 >> 1) - (u0 >> 4)
    qln = jnp.maximum(qln, jnp.int32(n) * x0i)
    u = -qln  # in [0, n*p]
    qt = (u * m) >> 26
    r = qln - x0i * qt
    e = ((r - 2 * x0i) << (jnp.int32(n) - qt)) >> 1  # in [0, p*2^n]

    # exact row sum with the spec's single deterministic rounding
    hi_sum = jnp.sum(e >> 16, axis=-1, keepdims=True).astype(jnp.float32)
    lo_sum = jnp.sum(e & 0xFFFF, axis=-1, keepdims=True).astype(jnp.float32)
    exp_sum = jnp.clip(hi_sum * (2.0**16) + lo_sum, 1.0, _I32_MAX)

    factor = jnp.floor(_I32_MAX / exp_sum) * (
        1.0 / 2.0 ** (32 - out_bits)
    )
    q_out = jnp.floor(e.astype(jnp.float32) * factor)
    scale_out = jnp.asarray(1.0 / 2.0 ** (out_bits - 1), jnp.float32)
    return q_out, scale_out


def _exact_sum_lastdim(exp_int: jax.Array, interp: Interp) -> jax.Array:
    """Order-independent row sum of shift-exp values.

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

    Rows longer than 256 (e.g. a 384-resolution ViT's N=577) would
    push the lo partial past 2^24 and silently reintroduce the
    order-dependent rounding, so they take a 3-limb split at 2^12
    instead: every partial stays exact for N ≤ 4096 (l0,l1 < 2^12 ⇒
    Σ ≤ N·2^12 < 2^24; l2 < 2^7 since exp < 2^31). The recombine is a
    fixed two-add expression tree — deterministic in any fusion
    context, identical in SIM and DEPLOY.
    """
    n_row = exp_int.shape[-1]
    if n_row <= 256:
        hi = interp.floor(exp_int * (1.0 / 2.0**16))
        lo = exp_int - hi * (2.0**16)
        hi_sum = jnp.sum(hi, axis=-1, keepdims=True)
        lo_sum = jnp.sum(lo, axis=-1, keepdims=True)
        return hi_sum * (2.0**16) + lo_sum
    assert n_row <= 4096, (
        f"exact shift-exp row sum supports rows <= 4096, got {n_row}"
    )
    l2 = interp.floor(exp_int * (1.0 / 2.0**24))
    rem = exp_int - l2 * (2.0**24)
    l1 = interp.floor(rem * (1.0 / 2.0**12))
    l0 = rem - l1 * (2.0**12)
    s2 = jnp.sum(l2, axis=-1, keepdims=True)
    s1 = jnp.sum(l1, axis=-1, keepdims=True)
    s0 = jnp.sum(l0, axis=-1, keepdims=True)
    return (s2 * (2.0**12) + s1) * (2.0**12) + s0
