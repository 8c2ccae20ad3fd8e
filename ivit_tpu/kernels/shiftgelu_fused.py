"""Pallas TPU kernel: fused requantize → ShiftGELU → requantize.

Replaces the XLA chain on the MLP hidden activation (B·N, 4C):
  int32 fc1 accumulator → per-channel requant(int8) → shift-sigmoid →
  x·σ → requant(int8 for fc2)
with one VMEM pass. Bit-identical to ``ivit_tpu.ops.shiftgelu`` (DEPLOY)
— the rebuild of quant_modules.py:389-445.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MAX = 2.0**31 - 1.0
_ROWS = 128


def _shift_exp(q, scale, n):
    q = q + jnp.floor(q / 2.0) - jnp.floor(q / 16.0)
    x0 = jnp.floor(-1.0 / scale)
    q = jnp.maximum(q, n * x0)
    qt = jnp.floor(q / x0)
    r = q - x0 * qt
    e = jnp.floor((r - 2.0 * x0) * jnp.exp2(n - 1.0 - qt))
    return jnp.clip(e, 0.0, _I32_MAX)


def _kernel(x_ref, r1_ref, out_ref, *, s_in, r2, n, out_bits):
    x = x_ref[...].astype(jnp.float32)
    q = jnp.clip(jnp.round(x * r1_ref[...]), -128.0, 127.0)

    sig_scale = s_in * 1.702
    q_max = jnp.max(q, axis=-1, keepdims=True)
    exp_int = _shift_exp(q - q_max, sig_scale, n)
    exp_max = _shift_exp(-q_max, sig_scale, n)
    exp_sum = jnp.clip(exp_int + exp_max, 1.0, _I32_MAX)

    factor = jnp.floor(_I32_MAX / exp_sum)
    sigmoid_int = jnp.floor(exp_int * factor / 2.0 ** (32 - out_bits))

    y = q * sigmoid_int  # scale s_in / 2^(out_bits-1)
    out_ref[...] = jnp.clip(jnp.round(y * r2), -128.0, 127.0).astype(jnp.int8)


def fused_requant_shiftgelu(
    x: jax.Array,
    r1: jax.Array,
    s_in: float,
    r2: float,
    out_bits: int = 8,
    n: int = 23,
    interpret: bool = False,
):
    """x: (M, C) int32 fc1 accumulator; ``r1``: (C,) per-channel requant
    ratio into the 8-bit GELU input scale ``s_in``; ``r2``: scalar ratio
    from the GELU output scale (s_in/2^(out_bits−1)) to the fc2 input
    scale. Returns int8 (M, C)."""
    M, C = x.shape
    assert C % 128 == 0, C
    rows = min(_ROWS, M)
    grid = (pl.cdiv(M, rows),)

    kernel = functools.partial(
        _kernel, s_in=float(s_in), r2=float(r2), n=float(n), out_bits=out_bits
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.int8),
        interpret=interpret,
    )(x, r1.reshape(1, C))
