"""Pallas TPU kernel: int8 matmul (fc1) with fused ShiftGELU epilogue.

The MLP's hidden activation is the largest intermediate in the model
(B·N × 4C int32). Fusing requant→ShiftGELU→requant into the matmul's
epilogue writes the int8 result directly — the int32 accumulator never
reaches HBM. (XLA cannot do this fusion itself because ShiftGELU
contains a cross-channel max reduction over the matmul's output axis.)

Bit-identical to _linear → requant → ops.shiftgelu → requant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MAX = 2.0**31 - 1.0


def _exp2i(k):
    # exact 2^k for integer-valued f32 k >= -126 via the exponent field
    # (ldexp); avoids the transcendental exp2 on the VPU.
    return jax.lax.bitcast_convert_type(
        (k.astype(jnp.int32) + 127) << 23, jnp.float32
    )
_ROWS = 256


def _shift_exp(q, scale, n):
    q = q + jnp.floor(q / 2.0) - jnp.floor(q / 16.0)
    x0 = jnp.floor(-1.0 / scale)
    q = jnp.maximum(q, n * x0)
    qt = jnp.floor(q / x0)
    r = q - x0 * qt
    e = jnp.floor((r - 2.0 * x0) * _exp2i(n - 1.0 - qt))
    return jnp.clip(e, 0.0, _I32_MAX)


def _kernel(x_ref, w_ref, b_ref, r1_ref, out_ref, *, s_in, r2, n, out_bits):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) + b_ref[...]

    q = jnp.clip(jnp.round(acc.astype(jnp.float32) * r1_ref[...]), -128.0, 127.0)

    sig_scale = s_in * 1.702
    q_max = jnp.max(q, axis=-1, keepdims=True)
    exp_int = _shift_exp(q - q_max, sig_scale, n)
    exp_max = _shift_exp(-q_max, sig_scale, n)
    exp_sum = jnp.clip(exp_int + exp_max, 1.0, _I32_MAX)

    factor = jnp.floor(_I32_MAX / exp_sum)
    sigmoid_int = jnp.floor(exp_int * factor / 2.0 ** (32 - out_bits))

    y = q * sigmoid_int
    out_ref[...] = jnp.clip(jnp.round(y * r2), -128.0, 127.0).astype(jnp.int8)


def fused_linear_shiftgelu(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    r1: jax.Array,
    s_in: float,
    r2: float,
    out_bits: int = 8,
    n: int = 23,
    interpret: bool = False,
):
    """x: (M, K) int8; w: (K, C) int8; b: (C,) int32; r1: (C,) per-channel
    requant ratio into the GELU input scale ``s_in``; r2: scalar ratio
    into the output int8 scale. Returns int8 (M, C)."""
    M, K = x.shape
    C = w.shape[1]
    rows = min(_ROWS, M)
    grid = (pl.cdiv(M, rows),)

    kernel = functools.partial(
        _kernel, s_in=float(s_in), r2=float(r2), n=float(n), out_bits=out_bits
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.int8),
        interpret=interpret,
    )(x, w, b.reshape(1, C), r1.reshape(1, C))
