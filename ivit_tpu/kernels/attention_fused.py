"""Pallas TPU kernel: fully-fused integer attention.

One kernel per (batch·head): int8 Q·Kᵀ on the MXU → requant → Shiftmax
(16-bit) → base-256 split → two int8 MXU matmuls with V + rank-1
correction → requant to int8 context. The (N, N) attention matrix lives
and dies in VMEM — it never touches HBM, eliminating the dominant
memory traffic of the attention tail (the reference materializes it
three times between TVM kernels: matmul → softmax → matmul,
/root/reference/TVM_benchmark/models/quantized_vit.py:55-79).

Bit-identical to the engine's "exact" XLA composition (requant →
shiftmax → split → int8 matmuls), which is itself tested against the
pure-JAX spec.
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


def _one_head(q, k, v, *, r1, scale, n, out_bits, n_valid, r_out):
    attn = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)  # (Npad, Npad)

    z = jnp.clip(jnp.round(attn * r1), -128.0, 127.0)
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    valid = col < n_valid
    z = jnp.where(valid, z, -(2.0**20))
    z = z - jnp.max(z, axis=-1, keepdims=True)

    # shift-exp (ops/shiftexp.py spec)
    z = z + jnp.floor(z / 2.0) - jnp.floor(z / 16.0)
    x0 = jnp.floor(-1.0 / scale)
    z = jnp.maximum(z, n * x0)
    qt = jnp.floor(z / x0)
    r = z - x0 * qt
    e = jnp.floor((r - 2.0 * x0) * _exp2i(n - 1.0 - qt))
    e = jnp.clip(e, 0.0, _I32_MAX)
    e = jnp.where(valid, e, 0.0)

    # order-independent exact row sum (ops/shiftmax.py spec)
    ehi = jnp.floor(e * (1.0 / 2.0**16))
    elo = e - ehi * (2.0**16)
    esum = (
        jnp.sum(ehi, axis=-1, keepdims=True) * (2.0**16)
        + jnp.sum(elo, axis=-1, keepdims=True)
    )
    esum = jnp.clip(esum, 1.0, _I32_MAX)
    # 2^-k folded into the per-row factor (exact; ops/shiftmax.py)
    factor = jnp.floor(_I32_MAX / esum) * (1.0 / 2.0 ** (32 - out_bits))
    sm = jnp.floor(e * factor)

    # base-256 split → two int8 MXU matmuls + rank-1 correction (exact)
    hi = jnp.floor(sm / 256.0)
    lo = sm - hi * 256.0 - 128.0
    ctx_hi = jax.lax.dot_general(
        hi.astype(jnp.int8), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    ctx_lo = jax.lax.dot_general(
        lo.astype(jnp.int8), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    v_sum = jnp.sum(v.astype(jnp.int32), axis=0, keepdims=True)
    ctx = (256 * ctx_hi + ctx_lo + 128 * v_sum).astype(jnp.float32)
    return jnp.clip(jnp.round(ctx * r_out), -128.0, 127.0).astype(jnp.int8)


def _kernel(q_ref, k_ref, v_ref, out_ref, *, heads, **kw):
    # several heads per grid cell so the DMA and grid-step overheads
    # amortize over more MXU work; fori_loop keeps the program small
    def body(h, _):
        out_ref[h] = _one_head(q_ref[h], k_ref[h], v_ref[h], **kw)
        return 0

    jax.lax.fori_loop(0, heads, body, 0)


def fused_int8_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    r1: float,
    scale: float,
    r_out: float,
    n_valid: int,
    out_bits: int = 16,
    n: int = 15,
    heads_per_cell: int = 0,
    interpret: bool = False,
):
    """q/k/v: (G, Npad, D) int8 (G = batch·heads, token axis padded to a
    lane multiple, pads zero). ``r1``: requant ratio into the softmax
    input scale; ``scale``: softmax input scale; ``r_out``: ratio from
    the context scale (softmax_scale·v_scale) into the int8 output scale.
    ``heads_per_cell``: heads processed per grid step (0 = auto: as many
    as divide G up to 8). Returns int8 (G, Npad, D) context (padded rows
    garbage — slice)."""
    G, Npad, D = q.shape
    assert Npad % 128 == 0, Npad
    if heads_per_cell <= 0:
        # >1 amortizes grid overhead but multiplies Mosaic program size
        # and (remote) compile time; 1 is the known-good default.
        heads_per_cell = 1

    kernel = functools.partial(
        _kernel,
        heads=heads_per_cell,
        r1=float(r1),
        scale=float(scale),
        n=float(n),
        out_bits=out_bits,
        n_valid=n_valid,
        r_out=float(r_out),
    )
    spec = pl.BlockSpec((heads_per_cell, Npad, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(G // heads_per_cell,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((G, Npad, D), jnp.int8),
        interpret=interpret,
    )(q, k, v)
