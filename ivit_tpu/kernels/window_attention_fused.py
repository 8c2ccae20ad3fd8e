"""Pallas TPU kernel: fully-fused integer Swin window attention.

One kernel per (batch·window·head): int8 Q·Kᵀ on the MXU → requant →
quantized relative-position-bias merge → (optional) shifted-window mask
add → 8-bit Shiftmax → ONE int8 MXU matmul with V (8-bit probabilities
fit int8 directly — Swin's deploy precision, swin_quant.py:108) →
requant to int8 context. The (N, N) score tensor lives and dies in
VMEM; the XLA path materializes it three times (scores, merged, probs)
around the N=49 batched dots — the small-window layout pathology
profiled at ~5 ms on Swin-T batch 128 and a fixed cost at batch 1.

Value chain copied op-for-op from deploy/swin_engine._attention (the
XLA oracle); the shift-exp runs with ALL guards (clamp + clip + sum
clip), which the elision proofs make value-identical to the engine's
statically-elided fast paths. Reference: the per-shape generated-kernel
role of /root/reference/TVM_benchmark/evaluate_latency.py:55-78.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._shiftmax_common import I32_MAX as _I32_MAX
from ._shiftmax_common import exact_rowsum_2limb, norm_factor, shift_exp_rows


def _one_cell(q, k, v, bias, mask, *, r1, rb, scale, n, n_valid, r_out):
    attn = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)  # (Npad, Npad) int32 scores

    a8 = jnp.clip(jnp.round(attn * r1), -128.0, 127.0)
    # dual-scale rel-pos bias merge (swin_engine: round(a8·s1/sb)+bias)
    z = jnp.clip(jnp.round(a8 * rb) + bias, -128.0, 127.0)
    if mask is not None:
        z = z + mask  # −100/s_bias addend, non-integral f32

    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    valid = col < n_valid
    z = jnp.where(valid, z, -(2.0**20))
    z = z - jnp.max(z, axis=-1, keepdims=True)

    # shift-exp (full guards) + exact row sum + folded 2^-k factor
    # (the shared ops spec — kernels/_shiftmax_common); out_bits=8
    e = shift_exp_rows(z, scale, n, valid)
    esum = jnp.clip(exact_rowsum_2limb(e), 1.0, _I32_MAX)
    sm = jnp.floor(e * norm_factor(esum, 8))  # [0, 127] int8-exact probs

    ctx = jax.lax.dot_general(
        sm.astype(jnp.int8), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return jnp.clip(jnp.round(ctx * r_out), -128.0, 127.0).astype(jnp.int8)


def _kernel(q_ref, k_ref, v_ref, bias_ref, *rest, masked, **kw):
    if masked:
        mask_ref, out_ref = rest
        mask = mask_ref[0]
    else:
        (out_ref,) = rest
        mask = None
    out_ref[0] = _one_cell(q_ref[0], k_ref[0], v_ref[0], bias_ref[0], mask, **kw)


def fused_int8_window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: jax.Array | None,
    r1: float,
    rb: float,
    scale: float,
    r_out: float,
    n_valid: int,
    heads: int,
    n: int = 15,
    interpret: bool = False,
):
    """q/k/v: (G, Npad, hd) int8 with G = B·nW·heads laid out so the
    head axis is innermost (cell i → head i % heads, window
    (i // heads) % nW). ``bias``: (heads, Npad, Npad) f32 — the frozen
    integer rel-pos bias at the softmax scale (pads zero). ``mask``:
    (nW, Npad, Npad) f32 shifted-window addend or None. ``r1``: requant
    ratio q@kᵀ → s_attn1; ``rb``: s_attn1 → s_bias merge ratio;
    ``scale``: softmax input scale (s_bias); ``r_out``: context →
    output-int8 ratio. Returns int8 (G, Npad, hd) context (padded rows
    garbage — slice)."""
    G, Npad, hd = q.shape
    assert Npad % 128 == 0, Npad
    assert G % heads == 0
    # Same exactness bound as attention_fused.fused_int8_attention: the
    # 2-limb row sum is only order-independent for <=256 valid columns
    # (window_size <= 16). Callers gate and fall back to XLA above it.
    assert n_valid <= 256, (
        f"fused window attention supports <=256 tokens (got {n_valid})"
    )
    n_w = mask.shape[0] if mask is not None else 1

    kernel = functools.partial(
        _kernel,
        masked=mask is not None,
        r1=float(r1),
        rb=float(rb),
        scale=float(scale),
        n=float(n),
        n_valid=n_valid,
        r_out=float(r_out),
    )
    qkv_spec = pl.BlockSpec((1, Npad, hd), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, Npad, Npad), lambda i: (i % heads, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    args = [q, k, v, bias]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, Npad, Npad),
                         lambda i: ((i // heads) % n_w, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((G, Npad, hd), jnp.int8),
        interpret=interpret,
    )(*args)
