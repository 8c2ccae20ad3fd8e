"""Checkpoint → deployable integer artifact (the ``convert_model.py`` analogue).

The reference converter reads the QAT checkpoint's named buffers
(``weight_integer``/``bias_integer``/``*_scaling_factor``) and assembles a
per-op scale graph whose invariant is: output scale of op k ≡ input scale
of op k+1 (/root/reference/TVM_benchmark/convert_model.py:12-148).

Here the same freeze happens functionally: weights are quantized once
from the trained params (identical math to the per-step recomputation in
``QuantLinear``), activation scales come from the frozen EMA ranges in
``quant_stats``, and every tensor in the artifact is a true integer dtype
(int8 weights, int32 biases) plus float32 scale vectors. Scale chaining
is implicit: the deploy engine threads scales through the very same graph
wiring as the QAT simulator, so the two cannot drift (the reference's
dual-implementation drift problem, SURVEY.md §7).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.quantizers import symmetric_scale, weight_scale

_EPS = float(np.finfo(np.float32).eps)


def _act_scale(stats, bits):
    # np.float32, NOT python float: every downstream ratio must be
    # computed in f32 exactly as the simulator computes it under jit —
    # a float64 intermediate double-rounds and flips requant boundaries.
    return np.float32(
        symmetric_scale(
            stats["min_val"].astype(np.float32),
            stats["max_val"].astype(np.float32),
            bits,
        )
    )


def _jit_freeze_linear(kernel, in_scale, weight_bits):
    """Weight/bias quantization through the simulator's own jitted ops.

    Host numpy MUST NOT quantize here: XLA's TPU f32 division resolves
    exact .5 ties differently than the host (reciprocal-multiply
    lowering), so quantizing on-host flips ~1-in-10⁵ weights relative to
    what the simulator trained with. Running the same jitted functions
    keeps freeze ≡ sim bit-for-bit on the deployment device.
    """
    import jax
    import jax.numpy as jnp

    from ..core.ste import quantize

    @jax.jit
    def f(kernel, in_scale):
        w_scale = weight_scale(kernel.T, weight_bits)
        w_int = quantize(kernel, w_scale, weight_bits)
        return w_int, w_scale * in_scale

    return f(jnp.asarray(kernel), jnp.float32(in_scale))


def _freeze_linear(p, in_scale, weight_bits=8):
    """QuantLinear params → int8 weights / int32 bias / per-channel scale.

    ``in_scale`` may be scalar; output scale is ``w_scale · in_scale``
    (quant_modules.py:85-97).
    """
    w_int, out_scale = _jit_freeze_linear(p["kernel"], in_scale, weight_bits)
    out = {
        "w": np.asarray(w_int, np.float32).astype(np.int8),
        "out_scale": np.asarray(out_scale, np.float32),
    }
    if "bias" in p:
        import jax
        import jax.numpy as jnp

        from ..core.ste import quantize as _q

        b_int = jax.jit(lambda b, s: _q(b, s, 32))(
            jnp.asarray(p["bias"]), out_scale
        )
        out["b"] = np.asarray(b_int, np.float64).astype(np.int32)
    return out


def _freeze_layernorm(p, dim):
    """IntLayerNorm: γ folds into the per-channel output scale, β into an
    integer bias (quant_modules.py:372-385).

    Computed through jitted device ops, not host numpy: the simulator
    derives ``bias_int = ⌊(β/γ)/base⌋`` on the device at runtime, and
    XLA's TPU f32 division resolves exact ties differently than the
    host — the same drift class ``_jit_freeze_linear`` closes for
    weights."""
    import jax
    import jax.numpy as jnp

    base = np.float32(math.sqrt(dim) / 2.0**30)

    @jax.jit
    def f(gamma, beta):
        bias_int = jnp.floor((beta / gamma) / base)
        return bias_int, gamma * base

    bias_int, out_scale = f(
        jnp.asarray(p["scale"], jnp.float32),
        jnp.asarray(p["bias"], jnp.float32),
    )
    return {
        "bias_int": np.asarray(bias_int, np.float32),
        "out_scale": np.asarray(out_scale, np.float32),
    }


def freeze_vit(model, variables) -> dict:
    """Freeze a trained VisionTransformer into an integer artifact.

    Returns a plain nested dict of numpy arrays (int8/int32/float32) —
    serializable (the ``params.npy`` analogue) and consumable by
    ``build_vit_infer``.
    """
    params = variables["params"]
    stats = variables["quant_stats"]
    D = model.embed_dim

    a = {
        "config": dict(
            img_size=model.img_size,
            patch_size=model.patch_size,
            embed_dim=D,
            depth=model.depth,
            num_heads=model.num_heads,
            mlp_ratio=model.mlp_ratio,
            num_classes=model.num_classes,
            # probability precision the model was simulated/trained at;
            # the engine reproduces it (8 → int8 probs + pure int8 @V,
            # the reference TVM deploy precision, layers.py:384-386)
            softmax_bits=getattr(model, "softmax_bits", 16),
            # GELU formulation (ops/shiftgelu.shiftgelu stable=) — the
            # engine must run the same mode the model simulated
            gelu_stable=getattr(model, "gelu_stable", False),
        )
    }

    s_input = _act_scale(stats["qact_input"], 8)
    a["input_scale"] = s_input
    a["patch_embed"] = _freeze_linear(
        params["patch_embed"]["proj"], s_input
    )
    s_embed = _act_scale(stats["qact_embed"], 16)
    a["embed_scale"] = s_embed

    # cls token quantized at the embed scale (vit_quant.py:259-262),
    # pos embed at its own 16-bit scale (vit_quant.py:264-265).
    a["cls_q"] = np.round(
        np.asarray(params["cls_token"], np.float32) / s_embed
    ).astype(np.float32)
    s_pos = _act_scale(stats["qact_pos"], 16)
    n = 2**15 - 1
    a["pos_q"] = np.clip(
        np.round(np.asarray(params["pos_embed"], np.float32) / s_pos),
        -n - 1,
        n,
    ).astype(np.float32)
    a["pos_scale"] = s_pos
    a["tokens_scale"] = _act_scale(stats["qact1"], 16)

    blocks = []
    for i in range(model.depth):
        bp = params[f"blocks_{i}"]
        bs = stats[f"blocks_{i}"]
        s_qact1 = _act_scale(bs["qact1"], 8)
        s_attn_qact1 = _act_scale(bs["attn"]["qact1"], 8)
        s_attn_sm_in = _act_scale(bs["attn"]["qact_attn1"], 8)
        s_attn_out = _act_scale(bs["attn"]["qact2"], 8)
        s_attn_proj = _act_scale(bs["attn"]["qact3"], 16)
        s_res1 = _act_scale(bs["qact2"], 16)
        s_qact3 = _act_scale(bs["qact3"], 8)
        s_gelu_in = _act_scale(bs["mlp"]["qact_gelu"], 8)
        s_gelu_out = _act_scale(bs["mlp"]["qact1"], 8)
        s_mlp_out = _act_scale(bs["mlp"]["qact2"], 16)
        s_res2 = _act_scale(bs["qact4"], 16)

        blocks.append(
            {
                "norm1": _freeze_layernorm(bp["norm1"], D),
                "s_qact1": s_qact1,
                "qkv": _freeze_linear(bp["attn"]["qkv"], s_qact1),
                "s_attn_qact1": s_attn_qact1,
                "s_attn_sm_in": s_attn_sm_in,
                "s_attn_out": s_attn_out,
                "proj": _freeze_linear(bp["attn"]["proj"], s_attn_out),
                "s_attn_proj": s_attn_proj,
                "s_res1": s_res1,
                "norm2": _freeze_layernorm(bp["norm2"], D),
                "s_qact3": s_qact3,
                "fc1": _freeze_linear(bp["mlp"]["fc1"], s_qact3),
                "s_gelu_in": s_gelu_in,
                "s_gelu_out": s_gelu_out,
                "fc2": _freeze_linear(bp["mlp"]["fc2"], s_gelu_out),
                "s_mlp_out": s_mlp_out,
                "s_res2": s_res2,
            }
        )
    a["blocks"] = blocks

    a["norm"] = _freeze_layernorm(params["norm"], D)
    a["head_in_scale"] = _act_scale(stats["qact2"], 8)
    a["head"] = _freeze_linear(params["head"], a["head_in_scale"])
    return a
