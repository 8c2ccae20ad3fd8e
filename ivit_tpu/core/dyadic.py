"""Dyadic (multiply + shift) requantization.

The reference decomposes every requantization ratio ``r = S_in / S_out``
into a 31-bit integer mantissa and a power-of-two exponent using numpy
frexp + Decimal ROUND_HALF_UP on the host, then multiplies in float64
(/root/reference/models/quantization_utils/quant_utils.py:150-261).
TPUs have no float64 and we refuse host round-trips, so this module
provides two TPU-native formulations:

1. ``requant_f32`` — the **canonical** spec: ``round(z * r)`` with the
   multiplier held in float32. This is exact-enough (≤1 LSB deviation from
   infinite precision, only at ties), runs on the VPU at full rate, and —
   crucially — is *the same XLA op sequence* in the QAT simulator and the
   deployed integer graph, so train/deploy bit-parity holds by
   construction. (The reference's float64+Decimal path could not run under
   jit and differed between its QAT and TVM interpreters anyway.)

2. ``dyadic_decompose`` + ``dyadic_mul_exact`` — a bit-exact integer-only
   path: the 63-bit product ``z * m`` is computed with 16-bit limbs in
   uint32 arithmetic and shifted right with round-half-away-from-zero.
   This is the strict analogue of ``batch_frexp`` + ``fixedpoint_mul``
   for integer-only hardware semantics, used by the strict deploy mode
   and by parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_BIT = 31


def dyadic_decompose(r: jax.Array, max_bit: int = _MAX_BIT):
    """Decompose positive ratio(s) ``r`` into ``(m, e)`` with r ≈ m / 2^e.

    ``m`` is int32 in ``[2^(max_bit-1), 2^max_bit)``; rounding of the
    mantissa is half-up, matching the reference's Decimal ROUND_HALF_UP
    (quant_utils.py:167-168). Works under jit (pure jnp.frexp).
    """
    r = r.astype(jnp.float32)
    frac, exp = jnp.frexp(r)  # r = frac * 2^exp, frac in [0.5, 1)
    m = jnp.floor(frac * (2.0 ** max_bit) + 0.5).astype(jnp.int32)
    e = (max_bit - exp).astype(jnp.int32)
    return m, e


def _split16(u: jax.Array):
    return u >> 16, u & jnp.uint32(0xFFFF)


def dyadic_mul_exact(z: jax.Array, m: jax.Array, e: jax.Array) -> jax.Array:
    """Exact integer ``round_half_away(z * m / 2^e)`` without 64-bit types.

    ``z``: int32 values (|z| < 2^31). ``m``: int32 mantissa in
    [2^30, 2^31). ``e``: int32 exponent, clamped to [1, 62]. The 63-bit
    product is assembled from 16x16→32 partial products in uint32 limbs —
    the TPU-native replacement for the reference's float64 multiply
    (quant_utils.py:229-230).
    """
    z = z.astype(jnp.int32)
    sign = jnp.where(z < 0, jnp.int32(-1), jnp.int32(1))
    zu = jnp.abs(z).astype(jnp.uint32)
    mu = m.astype(jnp.uint32)
    ei = jnp.clip(e.astype(jnp.int32), 1, 62)

    z_hi, z_lo = _split16(zu)
    m_hi, m_lo = _split16(mu)

    p0 = z_lo * m_lo            # bits 0..31
    p1a = z_hi * m_lo           # bits 16..47
    p1b = z_lo * m_hi           # bits 16..47
    p2 = z_hi * m_hi            # bits 32..62

    lo = p0 + (p1a << 16)
    c1 = (lo < p0).astype(jnp.uint32)
    lo2 = lo + (p1b << 16)
    c2 = (lo2 < lo).astype(jnp.uint32)
    hi = p2 + (p1a >> 16) + (p1b >> 16) + c1 + c2

    # Add the rounding constant 2^(e-1) (round half away from zero on the
    # magnitude), propagating the carry into the high limb. All shift
    # amounts are clamped to [0, 31] before use — XLA shifts are undefined
    # out of range and jnp.where evaluates both branches.
    def _ushift(amount):
        return jnp.clip(amount, 0, 31).astype(jnp.uint32)

    half_lo = jnp.where(ei <= 32, jnp.uint32(1) << _ushift(ei - 1), jnp.uint32(0))
    half_hi = jnp.where(ei > 32, jnp.uint32(1) << _ushift(ei - 33), jnp.uint32(0))
    lo3 = lo2 + half_lo
    c3 = (lo3 < lo2).astype(jnp.uint32)
    hi2 = hi + half_hi + c3

    # Shift the 64-bit (hi2, lo3) value right by e.
    small = (hi2 << _ushift(32 - ei)) | (lo3 >> _ushift(ei))      # e in [1, 31]
    big = hi2 >> _ushift(ei - 32)                                  # e in [33, 62]
    res = jnp.where(ei < 32, small, jnp.where(ei == 32, hi2, big))
    return sign * res.astype(jnp.int32)


def requant_f32(z: jax.Array, r: jax.Array) -> jax.Array:
    """Canonical requantization: round-to-nearest-even of ``z * r`` in f32.

    ``z`` may be a float32 integer-carrier (QAT sim) or an int32
    accumulator (deploy); ``r`` is the float32 multiplier S_in/S_out.
    Returns float32 integer values (caller casts/clips).
    """
    return jnp.round(z.astype(jnp.float32) * r.astype(jnp.float32))


def dyadic_requant(z: jax.Array, r: jax.Array) -> jax.Array:
    """Strict integer-only requantization of int32 ``z`` by ratio ``r``.

    Decomposes ``r`` (f32) then performs the exact limb multiply. Output
    int32.
    """
    m, e = dyadic_decompose(r)
    m = jnp.broadcast_to(m, z.shape)
    e = jnp.broadcast_to(e, z.shape)
    return dyadic_mul_exact(z.astype(jnp.int32), m, e)
