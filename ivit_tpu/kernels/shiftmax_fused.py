"""Pallas TPU kernel: fused requantize → Shiftmax → base-256 split.

One VMEM-resident pass replaces the XLA chain
  int32 attn → requant(int8) → max-sub → shift-exp → sum → factor →
  normalize → (hi, lo) int8 split for the 16×8 matmul decomposition
that otherwise round-trips the (B·H·N, N) attention tensor through HBM
several times. The arithmetic is bit-identical to the pure-JAX spec
(``ivit_tpu.ops.shiftmax`` with the DEPLOY interpreter — itself the
rebuild of /root/reference/models/quantization_utils/quant_modules.py:448-497).

Row layout: callers flatten the attention logits to (M, Npad) with the
key axis padded to a lane multiple; padded columns are forced to zero
probability exactly (the unpadded reference semantics).

The in-kernel value chain lives in ``_shiftmax_common`` (one source of
truth shared with the fused attention kernels); its 2-limb exact row
sum bounds valid rows to ≤ 256 columns — asserted here, and
deploy/engine disables this kernel for longer sequences (the XLA path
switches to the 3-limb exact sum there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._shiftmax_common import (
    I32_MAX,
    exact_rowsum_2limb,
    norm_factor,
    shift_exp_rows,
)

_ROWS = 256  # rows per grid step


def _kernel(x_ref, hi_ref, lo_ref, *, r1, scale, n, out_bits, n_valid):
    x = x_ref[...].astype(jnp.float32)
    # requantize the int32 q·kᵀ accumulator to int8 at `scale`
    q = jnp.clip(jnp.round(x * r1), -128.0, 127.0)

    col = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    valid = col < n_valid
    # padded cols must not win the max
    q = jnp.where(valid, q, -(2.0**20))
    q = q - jnp.max(q, axis=-1, keepdims=True)

    exp_int = shift_exp_rows(q, scale, n, valid)
    exp_sum = jnp.clip(exact_rowsum_2limb(exp_int), 1.0, I32_MAX)
    sm = jnp.floor(exp_int * norm_factor(exp_sum, out_bits))

    # base-256 split for the two-int8-matmul decomposition:
    # sm = 256·hi + (lo′ + 128), exact for sm ∈ [0, 2^15].
    hi = jnp.floor(sm / 256.0)
    hi_ref[...] = hi.astype(jnp.int8)
    lo_ref[...] = (sm - hi * 256.0 - 128.0).astype(jnp.int8)


def fused_requant_shiftmax(
    x: jax.Array,
    r1: float,
    scale: float,
    n_valid: int,
    out_bits: int = 16,
    n: int = 15,
    interpret: bool = False,
):
    """x: (M, Npad) int32 attention logits (Npad a multiple of 128).

    Returns ``(hi, lo)`` int8 arrays with
    ``softmax_int = 256·hi + (lo + 128)`` at scale ``1/2^(out_bits−1)``.
    """
    M, Npad = x.shape
    assert Npad % 128 == 0, Npad
    assert n_valid <= 256, (
        f"fused_requant_shiftmax requires <=256 valid columns (2-limb "
        f"exact-row-sum bound), got {n_valid}; use the XLA path "
        f"(ops/shiftmax widens to a 3-limb split for long rows)"
    )
    rows = min(_ROWS, M)
    grid = (pl.cdiv(M, rows),)

    kernel = functools.partial(
        _kernel,
        r1=float(r1),
        scale=float(scale),
        n=float(n),
        out_bits=out_bits,
        n_valid=n_valid,
    )
    hi, lo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, Npad), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((rows, Npad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, Npad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, Npad), jnp.int8),
            jax.ShapeDtypeStruct((M, Npad), jnp.int8),
        ),
        interpret=interpret,
    )(x)
    return hi, lo
