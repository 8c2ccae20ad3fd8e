"""Integer-only inference engine (the TVM deployment-path analogue).

Replaces the reference's Relay graph builder + auto-scheduled CUDA
kernels (/root/reference/TVM_benchmark/models/quantized_vit.py:180-274,
evaluate_latency.py:55-88) with an XLA/AOT-compiled integer graph:

* every weight matmul runs on the MXU's native int8 path
  (``lax.dot_general`` on int8 operands, int32 accumulation);
* requantization is a fused VPU epilogue: int32 accumulator × static
  float32 ratio → round → clip → int8 (the dyadic multiply+shift of
  ``fixedpoint_mul``; ratios are compile-time constants so XLA folds and
  fuses them into the matmul consumer);
* the integer nonlinearities (Shiftmax, ShiftGELU, I-LayerNorm) are the
  *same functions* the QAT simulator runs (``ivit_tpu.ops`` with the
  DEPLOY interpreter) — one spec, two execution modes, no drift;
* the only float op is the final logit dequantization, mirroring the
  reference (quantized_vit.py:265-271).

The artifact's scales are captured as Python/numpy constants at trace
time, so the compiled graph contains no scale recomputation at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import DEPLOY, int_layernorm, shiftgelu, shiftmax

_INT8 = (-128, 127)
_INT16 = (-(2**15), 2**15 - 1)


def _requant(acc, ratio, lo, hi, dtype):
    """int32/f32 accumulator → integer at the target scale.

    ``ratio`` is a static constant (scalar or per-channel row vector);
    XLA fuses this whole epilogue into the producing matmul.
    """
    y = jnp.round(acc.astype(jnp.float32) * ratio)
    return jnp.clip(y, lo, hi).astype(dtype)


def _int8_matmul(x_int8, w_int8):
    """MXU-native int8×int8→int32 matmul."""
    return jax.lax.dot_general(
        x_int8,
        w_int8,
        dimension_numbers=(((x_int8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _linear(x_int8, layer):
    y = _int8_matmul(x_int8, jnp.asarray(layer["w"]))
    if "b" in layer:
        y = y + jnp.asarray(layer["b"])
    return y  # int32 at scale layer["out_scale"] (per-channel)


def build_vit_infer(artifact: dict):
    """Build the jittable int8 inference fn: float NHWC images → logits.

    All constants are baked at trace time; wrap the result in ``jax.jit``
    (or AOT via ``.lower().compile()``) before timing.
    """
    cfg = artifact["config"]
    D, H = cfg["embed_dim"], cfg["num_heads"]
    hd = D // H
    p = cfg["patch_size"]
    qk_scale = float(hd) ** -0.5

    def infer(images):
        B = images.shape[0]
        # Host-side input quantization happens on-device here (the
        # reference quantizes on host, evaluate_accuracy.py:58-61).
        s_in = artifact["input_scale"]
        x = jnp.clip(jnp.round(images / s_in), *_INT8).astype(jnp.int8)

        # Patch embed: space-to-depth + int8 matmul.
        gh = cfg["img_size"] // p
        x = x.reshape(B, gh, p, gh, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gh, p * p * 3)
        pe = artifact["patch_embed"]
        acc = _linear(x, pe)
        s_embed = artifact["embed_scale"]
        x = _requant(acc, pe["out_scale"] / s_embed, *_INT16, jnp.int32)

        # cls concat at the shared scale; pos-embed dual-scale merge.
        cls = jnp.broadcast_to(
            jnp.asarray(artifact["cls_q"], jnp.int32), (B, 1, D)
        )
        x = jnp.concatenate([cls, x], axis=1)
        s_tok = artifact["tokens_scale"]
        pos = jnp.round(
            jnp.asarray(artifact["pos_q"]) * (artifact["pos_scale"] / s_tok)
        )
        x = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (s_embed / s_tok)) + pos,
            *_INT16,
        )
        s_x = s_tok  # int16-valued f32 carrier, 16-bit range

        for blk in artifact["blocks"]:
            x, s_x = _block(x, s_x, blk, H, hd, qk_scale)

        # Final norm → CLS → head.
        nz = artifact["norm"]
        y, s_n = int_layernorm(
            x,
            jnp.ones((D,)),
            jnp.zeros((D,)),
            interp=DEPLOY,
        )
        # fold frozen γ/β: int_layernorm with unit affine, then apply the
        # frozen per-channel scale/bias from the artifact.
        y = y + jnp.asarray(nz["bias_int"])
        s_n = jnp.asarray(nz["out_scale"])

        y = y[:, 0]
        s_head = artifact["head_in_scale"]
        y = _requant(y, s_n / s_head, *_INT8, jnp.int8)
        head = artifact["head"]
        logits = _linear(y, head)
        return logits.astype(jnp.float32) * head["out_scale"]

    def _block(x, s_x, blk, H, hd, qk_scale):
        B, N, D = x.shape
        # --- attention half ---
        n1 = blk["norm1"]
        y, _ = int_layernorm(
            x.astype(jnp.float32), jnp.ones((D,)), jnp.zeros((D,)), interp=DEPLOY
        )
        y = y + jnp.asarray(n1["bias_int"])
        s_y = jnp.asarray(n1["out_scale"])

        s1 = blk["s_qact1"]
        y = _requant(y, s_y / s1, *_INT8, jnp.int8)

        qkv = blk["qkv"]
        acc = _linear(y, qkv)
        sa1 = blk["s_attn_qact1"]
        z = _requant(acc, qkv["out_scale"] / sa1, *_INT8, jnp.int8)

        z = z.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = z[0], z[1], z[2]

        attn = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32,
        )  # (B, H, N, N) at scale sa1²
        s_attn = sa1 * sa1 * qk_scale
        ssm = blk["s_attn_sm_in"]
        attn = _requant(attn, s_attn / ssm, *_INT8, jnp.float32)

        sm, _ = shiftmax(attn, jnp.float32(ssm), out_bits=16, interp=DEPLOY)
        s_sm = 1.0 / 2.0**15

        # attn(16b) @ v(8b): f32 carriers with HIGHEST precision — the
        # MXU has no 16×8 int mode; exact ≤2^24, matching the simulator.
        ctx = jax.lax.dot_general(
            sm,
            v.astype(jnp.float32),
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s_ctx = s_sm * sa1
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, D)

        sao = blk["s_attn_out"]
        ctx = _requant(ctx, s_ctx / sao, *_INT8, jnp.int8)

        proj = blk["proj"]
        acc = _linear(ctx, proj)
        sap = blk["s_attn_proj"]
        ctx = _requant(acc, proj["out_scale"] / sap, *_INT16, jnp.float32)

        # residual merge (dual-scale, 16-bit): the identity branch is the
        # block input at s_x (vit_quant.py:135).
        sr1 = blk["s_res1"]
        x = jnp.clip(
            jnp.round(ctx * (sap / sr1))
            + jnp.round(x.astype(jnp.float32) * (s_x / sr1)),
            *_INT16,
        )
        s_x = sr1

        # --- MLP half ---
        n2 = blk["norm2"]
        y, _ = int_layernorm(
            x, jnp.ones((D,)), jnp.zeros((D,)), interp=DEPLOY
        )
        y = y + jnp.asarray(n2["bias_int"])
        s_y = jnp.asarray(n2["out_scale"])

        s3 = blk["s_qact3"]
        y = _requant(y, s_y / s3, *_INT8, jnp.int8)

        fc1 = blk["fc1"]
        acc = _linear(y, fc1)
        sg_in = blk["s_gelu_in"]
        g = _requant(acc, fc1["out_scale"] / sg_in, *_INT8, jnp.float32)

        g, s_g = shiftgelu(g, jnp.float32(sg_in), out_bits=8, interp=DEPLOY)
        sg_out = blk["s_gelu_out"]
        g = _requant(g, s_g / sg_out, *_INT8, jnp.int8)

        fc2 = blk["fc2"]
        acc = _linear(g, fc2)
        smo = blk["s_mlp_out"]
        m = _requant(acc, fc2["out_scale"] / smo, *_INT16, jnp.float32)

        sr2 = blk["s_res2"]
        x = jnp.clip(
            jnp.round(m * (smo / sr2)) + jnp.round(x * (s_x / sr2)),
            *_INT16,
        )
        return x, sr2

    return infer
