"""Pallas TPU kernel: fused I-LayerNorm → β fold → per-channel requantize.

One VMEM pass over (B·N, C) replacing: integer mean/var, the 10-step
Newton integer sqrt (quant_modules.py:366-370), ⌊(2³¹−1)/std⌋
normalization, the folded integer β add, and the requantization into the
next op's 8-bit scale. Bit-identical to ``ivit_tpu.ops.int_layernorm``
(DEPLOY) composed with ``requantize``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MAX = 2.0**31 - 1.0
_ROWS = 256


def _kernel(x_ref, bias_ref, ratio_ref, out_ref, *, lo, hi):
    x = x_ref[...].astype(jnp.float32)
    d = x.shape[-1]
    # exact one-pass stats in int32 lanes (ops/intnorm.py spec):
    # q2 = a2*2^16 + 2ab*2^8 + b2, var = Sq2 - 2m*Sq + D*m2
    xi = x.astype(jnp.int32)
    a = xi >> 8
    b = xi & 255
    s_q = jnp.sum(xi, axis=-1, keepdims=True).astype(jnp.float32)
    s_bb = jnp.sum(b * b, axis=-1, keepdims=True).astype(jnp.float32)
    if d <= 1000:
        # merged accumulator: q2 = (a2*2^7 + ab)*2^9 + b2 (ops spec)
        s_t = jnp.sum(a * a * 128 + a * b, axis=-1, keepdims=True)
        sq2 = s_t.astype(jnp.float32) * (2.0**9) + s_bb
    else:
        s_aa = jnp.sum(a * a, axis=-1, keepdims=True).astype(jnp.float32)
        s_ab = jnp.sum(a * b, axis=-1, keepdims=True).astype(jnp.float32)
        sq2 = s_aa * (2.0**16) + s_ab * (2.0**9) + s_bb
    mean = jnp.round(s_q / d)
    var = jnp.maximum(sq2 - 2.0 * mean * s_q + d * mean * mean, 0.0)
    y = x - mean

    k = jnp.full_like(var, 2.0**16)
    for _ in range(10):
        k = jnp.floor((k + jnp.floor(var / k)) / 2.0)
    std = jnp.maximum(k, 1.0)

    factor = jnp.floor(_I32_MAX / std)
    y = jnp.floor(y * factor / 2.0) + bias_ref[...]

    out = jnp.clip(jnp.round(y * ratio_ref[...]), lo, hi)
    out_ref[...] = out.astype(jnp.int8)


def fused_layernorm_requant(
    x: jax.Array,
    bias_int: jax.Array,
    ratio: jax.Array,
    bits: int = 8,
    interpret: bool = False,
):
    """x: (M, C) integer-valued f32 carrier; ``bias_int``: (C,) folded β;
    ``ratio``: (C,) per-channel scale ratio (γ·√C/2³⁰ / s_out).
    Returns int8 (M, C)."""
    M, C = x.shape
    assert C % 128 == 0, C
    rows = min(_ROWS, M)
    grid = (pl.cdiv(M, rows),)
    n = 2 ** (bits - 1)

    kernel = functools.partial(_kernel, lo=float(-n), hi=float(n - 1))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.int8),
        interpret=interpret,
    )(x, bias_int.reshape(1, C), ratio.reshape(1, C))
