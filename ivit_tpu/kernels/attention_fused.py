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

from ._shiftmax_common import I32_MAX as _I32_MAX
from ._shiftmax_common import exact_rowsum_2limb, norm_factor, shift_exp_rows


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

    # shift-exp + exact row sum + folded 2^-k factor (the shared
    # ops/shiftexp + ops/shiftmax spec — kernels/_shiftmax_common)
    e = shift_exp_rows(z, scale, n, valid)
    esum = jnp.clip(exact_rowsum_2limb(e), 1.0, _I32_MAX)
    sm = jnp.floor(e * norm_factor(esum, out_bits))

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
    # The 2-limb (base-2^16) row sum in _one_head is exact only while
    # each limb's f32 partial sums stay below 2^24: lo < 2^16 per
    # element caps the row at 256 valid columns (the same bound
    # ops/shiftmax._exact_sum_lastdim gates on — longer rows would
    # silently reintroduce order-dependent rounding and break the
    # bit-identity to the XLA/sim oracle). Callers (engine p_attn
    # gates) fall back to the XLA path above this.
    assert n_valid <= 256, (
        f"fused attention supports <=256 tokens (got {n_valid}): the "
        "2-limb exact row sum bound; use the XLA path"
    )
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
