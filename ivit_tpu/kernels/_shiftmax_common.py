"""Shared in-kernel Shiftmax building blocks.

The fused attention kernels (attention_fused, attention_fused_v2,
window_attention_fused) all inline the same shift-exp chain and exact
row sum (the ops/shiftexp + ops/shiftmax spec, restated in plain f32
ops Mosaic lowers well). One source of truth lives here so a spec
change (e.g. the >256-column sum gating) cannot drift between kernel
copies — the value chains stay bit-identical to the ops oracle
(tests/test_kernels, tests/test_swin_deploy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

I32_MAX = 2.0**31 - 1.0


def exp2i(k):
    """Exact 2^k for integer-valued f32 k ≥ −126 via the exponent field
    (ldexp bit-trick); avoids the polynomial-approximated transcendental
    exp2 on the VPU (ops/interp.py)."""
    return jax.lax.bitcast_convert_type(
        (k.astype(jnp.int32) + 127) << 23, jnp.float32
    )


def shift_exp_rows(z, scale, n, valid, clip_e: bool = True):
    """The ops/shiftexp.py chain on row-max-subtracted integer scores.

    ``z``: f32 integer-valued scores, already ≤ 0 (max-subtracted) with
    invalid lanes at a large negative sentinel. ``valid``: bool mask of
    real columns. Returns the f32 integer exp values with invalid lanes
    zeroed. ``clip_e=False`` elides the per-element [0, 2³¹−1] clip —
    value-identical only when the caller proves p·2ⁿ ≤ 2³¹−1 (the v2
    kernel's gate)."""
    z = z + jnp.floor(z / 2.0) - jnp.floor(z / 16.0)
    x0 = jnp.floor(-1.0 / scale)
    z = jnp.maximum(z, n * x0)
    qt = jnp.floor(z / x0)
    r = z - x0 * qt
    e = jnp.floor((r - 2.0 * x0) * exp2i(n - 1.0 - qt))
    if clip_e:
        e = jnp.clip(e, 0.0, I32_MAX)
    return jnp.where(valid, e, 0.0)


def exact_rowsum_2limb(e):
    """Order-independent exact row sum of exp values via a base-2¹⁶
    hi/lo split (ops/shiftmax.py spec). Exact only for ≤ 256 valid
    columns (lo partials must stay below 2²⁴) — callers assert."""
    ehi = jnp.floor(e * (1.0 / 2.0**16))
    elo = e - ehi * (2.0**16)
    return (
        jnp.sum(ehi, axis=-1, keepdims=True) * (2.0**16)
        + jnp.sum(elo, axis=-1, keepdims=True)
    )


def norm_factor(esum, out_bits):
    """Per-row normalization factor with the 2^−(32−out_bits) requant
    shift folded in (exact — ops/shiftmax.py); esum must already be
    clipped to [1, 2³¹−1]."""
    return jnp.floor(I32_MAX / esum) * (1.0 / 2.0 ** (32 - out_bits))
