"""Pallas TPU kernel: fused integer attention, v2 (batch-128 regime).

One grid cell per *image*: all heads' int8 Q·Kᵀ dots run back-to-back on
the MXU into a single (H, Mpad, Npad) VMEM scratch, the whole
requant→Shiftmax chain then executes as ONE batched VPU phase over that
scratch (v1 ran it per head on small (256, 256) tiles — the per-head
serialization and the base-256 @V split are why v1 loses at batch 128,
BENCH_NOTES), and the probabilities×V matmuls run as single f32 HIGH
(3-pass bf16) dots — the engine's own @V mode — before an int8 requant
epilogue writes the context.

The attention matrix and the exp tensor never reach HBM (the XLA path
materializes the s8 scores and the softmax output and re-derives the exp
between the sum and normalize consumers). HBM per (block, image):
~48 KB in, ~14 KB out.

Bit-parity with the engine's XLA composition (requant → ops.shiftmax →
HIGH @V → requant), by construction:

* identical op order and f32 arithmetic for the chain;
* the row sum is accumulated in int32 — exact, and equal to the spec's
  hi/lo-split f32 sum (both produce the exact integer sum; the single
  f32 rounding happens at the same recombine point) — callers must gate
  on ``197·p·2^n < 2^31`` (``p = −⌊−1/scale⌋``) so the int32 sum cannot
  wrap; the builder gate is ``p ≤ 333`` for N ≤ 224 valid keys;
* the per-element ``clip(e, 0, 2^31−1)`` of ops/shiftexp.py is elided:
  for ``p·2^n ≤ 2^31−1`` (implied by the same gate) the clip can never
  bind (``0 < r − 2x0·… ≤ p·2^n``), so eliding is value-identical.

Reference roles: the generated attention kernels of the TVM deploy path
(/root/reference/TVM_benchmark/models/quantized_vit.py:55-79,
evaluate_latency.py:55-78).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._shiftmax_common import I32_MAX as _I32_MAX
from ._shiftmax_common import norm_factor, shift_exp_rows


def _kernel(q_ref, k_ref, v_ref, out_ref, s_ref, *, heads, r1, scale, n,
            out_bits, n_valid, r_out):
    # ---- phase 1 (MXU): all heads' int8 scores into the f32 scratch
    for h in range(heads):
        acc = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (Mpad, Npad) int32
        s_ref[h] = acc.astype(jnp.float32)

    # ---- phase 2 (VPU): one batched Shiftmax chain over (H, Mpad, Npad)
    z = s_ref[...]
    zq = jnp.clip(jnp.round(z * r1), -128.0, 127.0)
    col = jax.lax.broadcasted_iota(jnp.int32, zq.shape, 2)
    valid = col < n_valid
    zq = jnp.where(valid, zq, -(2.0**20))
    zq = zq - jnp.max(zq, axis=-1, keepdims=True)

    # shared chain (kernels/_shiftmax_common); the per-element clip is
    # elided — value-identical under this kernel's p·2ⁿ ≤ 2³¹−1 gate
    # (module docstring)
    e = shift_exp_rows(zq, scale, n, valid, clip_e=False)

    # exact int32 row sum == the spec's hi/lo-split f32 sum (see module
    # docstring; caller gates the scale so this cannot wrap)
    esum = jnp.sum(e.astype(jnp.int32), axis=-1, keepdims=True).astype(
        jnp.float32
    )
    esum = jnp.clip(esum, 1.0, _I32_MAX)
    sm = jnp.floor(e * norm_factor(esum, out_bits))

    # ---- phase 3 (MXU): probabilities @ V in f32 HIGHEST (Mosaic does
    # not lower HIGH; HIGHEST is bit-equal to the engine's HIGH @V for
    # 15-bit x 7-bit operands — BENCH_NOTES — and the in-kernel @V MXU
    # time is negligible), requant epilogue to int8
    for h in range(heads):
        ctx = jax.lax.dot_general(
            sm[h], v_ref[0, h].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (Mpad, hd)
        out_ref[0, h] = jnp.clip(
            jnp.round(ctx * r_out), -128.0, 127.0
        ).astype(jnp.int8)


def fused_int8_attention_v2(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    r1: float,
    scale: float,
    r_out: float,
    n_valid: int,
    out_bits: int = 16,
    n: int = 15,
    interpret: bool = False,
):
    """q: (B, H, Mpad, hd) int8 — query rows padded to a 32-multiple;
    k: (B, H, hd, Npad) int8 — keys pre-transposed, token axis padded to
    a 128-multiple with zeros; v: (B, H, Npad, hd) int8, zero-padded.
    ``r1``: requant ratio into the Shiftmax input scale; ``scale``: the
    Shiftmax input scale; ``r_out``: context→int8 output ratio.
    Returns (B, H, Mpad, hd) int8 context (padded rows garbage — slice).

    Caller must ensure ``n_valid·p·2^n < 2^31`` with ``p = ⌊1/scale⌋``
    (int32 row-sum exactness + clip elision; see module docstring).
    """
    B, H, Mpad, hd = q.shape
    Npad = k.shape[3]
    assert Npad % 128 == 0 and Mpad % 32 == 0, (Mpad, Npad)
    assert k.shape == (B, H, hd, Npad), k.shape
    assert v.shape == (B, H, Npad, hd), v.shape
    p_abs = -math.floor(-1.0 / float(scale))
    assert n_valid * p_abs * 2.0**n < 2.0**31, (
        "scale too small for the int32-sum/no-clip fast path; "
        "use the XLA engine path"
    )

    kernel = functools.partial(
        _kernel,
        heads=H,
        r1=float(r1),
        scale=float(scale),
        n=float(n),
        out_bits=out_bits,
        n_valid=n_valid,
        r_out=float(r_out),
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Mpad, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, hd, Npad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Npad, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Mpad, hd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Mpad, hd), jnp.int8),
        scratch_shapes=[pltpu.VMEM((H, Mpad, Npad), jnp.float32)],
        interpret=interpret,
    )(q, k, v)
