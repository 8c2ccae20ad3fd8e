"""Ingest the reference's OWN trained QAT checkpoints into our artifact.

The reference deploys by reading ``checkpoint.pth.tar``'s named integer
buffers — ``weight_integer`` / ``bias_integer`` / ``*_scaling_factor`` —
and re-assembling the scale graph op by op
(/root/reference/TVM_benchmark/convert_model.py:12-78 ``save_params``,
:80-148 ``load_qconfig``).  ``freeze_vit`` (convert.py) covers OUR
TrainStates; this module covers THEIRS: a user holding an I-ViT-trained
torch checkpoint can deploy it on this engine with no torch model in
the loop — only ``torch.load`` for deserialization.

Fidelity contract: the integer weights and every activation scale are
taken **verbatim** from the reference's buffers (quantized by the
reference's own code during its QAT forward, quant_modules.py:82-96),
so the engine reproduces the reference torch model's eval forward up to
the catalogued ≤1-LSB carrier-tie differences (see
tests/test_ref_differential.py catalogue #1) — verified end-to-end by
tests/test_ingest_torch.py, which freezes a reference model with the
REFERENCE's own code path and asserts engine ≡ torch logits.

Scale-graph equivalence to ``load_qconfig``: the reference chains
``output scale of op k ≡ input scale of op k+1`` explicitly
(convert_model.py:96-144); our engine threads scales through the graph
wiring itself, so handing it the per-QuantAct ``act_scaling_factor``
buffers reproduces the same chain with no opportunity to drift.
"""

from __future__ import annotations

import re

import numpy as np

_I16 = 2**15 - 1


def _np(sd, key):
    if key not in sd:
        raise KeyError(
            f"reference checkpoint is missing buffer {key!r} — was the "
            "model trained with the I-ViT QAT code (quant_modules.py "
            "registers it) and saved AFTER at least one forward pass?"
        )
    return np.asarray(sd[key])


def _scalar(sd, key):
    v = _np(sd, key).reshape(-1)
    s = np.float32(v[0])
    if s <= 0:
        raise ValueError(
            f"{key} = {float(s)} — the checkpoint's quant state was "
            "never populated (scale buffers are zeros until the first "
            "forward; run calibration/QAT before saving)"
        )
    return s


def _linear(sd, prefix, in_scale):
    """QuantLinear buffers → engine layer dict, weights verbatim.

    Reference layout: ``weight_integer`` (out, in) float-holding-ints,
    ``bias_integer`` at ``fc_scaling_factor · in_scale``
    (quant_modules.py:82-96). Engine layout: ``w`` (in, out) int8,
    ``b`` int32, ``out_scale`` per-out-channel f32.
    """
    w = _np(sd, f"{prefix}.weight_integer")
    out = {
        "w": np.rint(w).astype(np.int8).T.copy(),
        "out_scale": (
            _np(sd, f"{prefix}.fc_scaling_factor").astype(np.float32)
            * in_scale
        ).astype(np.float32),
    }
    bkey = f"{prefix}.bias_integer"
    if bkey in sd:
        out["b"] = np.rint(_np(sd, bkey)).astype(np.int32)
    return out


def _norm(sd, prefix):
    """IntLayerNorm buffers map 1:1: the reference's
    ``norm_scaling_factor`` IS γ·√D/2³⁰ and ``bias_integer`` IS
    ⌊(β/γ)/base⌋ (quant_modules.py:344-385) — the exact pair
    ``_freeze_layernorm`` derives for our own checkpoints."""
    return {
        "bias_int": _np(sd, f"{prefix}.bias_integer").astype(np.float32),
        "out_scale": _np(sd, f"{prefix}.norm_scaling_factor").astype(
            np.float32
        ),
    }


def unwrap_state_dict(obj):
    """checkpoint.pth.tar stores the state dict under ``'model'``
    (quant_train.py resume path reads checkpoint['model']); the TVM
    converter also accepts a bare state dict. Handle both, and map any
    torch tensors to numpy."""
    if hasattr(obj, "keys") and "model" in obj and not any(
        "." in k for k in obj.keys()
    ):
        obj = obj["model"]
    out = {}
    for k, v in obj.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else (
            np.asarray(v)
        )
    return out


def torch_vit_state_to_artifact(
    sd,
    num_heads,
    softmax_bits=16,
    gelu_stable=False,
) -> dict:
    """Reference ViT/DeiT QAT state dict → deployable integer artifact.

    ``sd``: name → array (use :func:`unwrap_state_dict` on a
    ``torch.load`` result). ``num_heads`` is the one config value not
    recoverable from the buffers (the reference converter likewise
    takes ``--depth`` from the operator, convert_model.py:160).
    ``softmax_bits``/``gelu_stable`` describe the nonlinearity spec the
    checkpoint was trained under (reference ViT QAT: 16-bit softmax,
    standard ShiftGELU — the defaults).
    """
    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k))
    )

    cls = _np(sd, "cls_token").astype(np.float32)  # (1, 1, D)
    D = cls.shape[-1]
    pw = _np(sd, "patch_embed.proj.weight_integer")  # (D, C, ph, pw)
    p = pw.shape[-1]
    n_tok = _np(sd, "pos_embed").shape[1]
    gh = int(round((n_tok - 1) ** 0.5))
    head_w = _np(sd, "head.weight_integer")

    a = {
        "config": dict(
            img_size=gh * p,
            patch_size=p,
            embed_dim=D,
            depth=depth,
            num_heads=int(num_heads),
            mlp_ratio=_np(sd, "blocks.0.mlp.fc1.weight_integer").shape[0]
            / D,
            num_classes=head_w.shape[0],
            softmax_bits=int(softmax_bits),
            gelu_stable=bool(gelu_stable),
        )
    }

    s_input = _scalar(sd, "qact_input.act_scaling_factor")
    a["input_scale"] = s_input
    a["patch_embed"] = {
        # conv (D, C, ph, pw) → space-to-depth matmul kernel
        # (ph·pw·C, D), row order (ph, pw, c) — the same layout the
        # float importer uses (models/import_torch.py:101-104)
        "w": np.rint(pw).astype(np.int8).transpose(2, 3, 1, 0)
        .reshape(-1, D).copy(),
        "b": np.rint(_np(sd, "patch_embed.proj.bias_integer")).astype(
            np.int32
        ),
        "out_scale": (
            _np(sd, "patch_embed.proj.conv_scaling_factor").astype(
                np.float32
            )
            * s_input
        ).astype(np.float32),
    }
    s_embed = _scalar(sd, "patch_embed.qact.act_scaling_factor")
    a["embed_scale"] = s_embed

    # cls at the shared embed scale, pos at its own 16-bit scale —
    # the reference's TVM graph quantizes both from the float params
    # it saved (save_params 'cls_token_weight'/'pos_embed_weight',
    # convert_model.py:63-65; graph wiring vit_quant.py:259-265).
    a["cls_q"] = np.round(cls / s_embed).astype(np.float32)
    s_pos = _scalar(sd, "qact_pos.act_scaling_factor")
    a["pos_q"] = np.clip(
        np.round(_np(sd, "pos_embed").astype(np.float32) / s_pos),
        -_I16 - 1,
        _I16,
    ).astype(np.float32)
    a["pos_scale"] = s_pos
    a["tokens_scale"] = _scalar(sd, "qact1.act_scaling_factor")

    blocks = []
    for i in range(depth):
        b = f"blocks.{i}"
        s_qact1 = _scalar(sd, f"{b}.qact1.act_scaling_factor")
        s_attn_out = _scalar(sd, f"{b}.attn.qact2.act_scaling_factor")
        s_qact3 = _scalar(sd, f"{b}.qact3.act_scaling_factor")
        s_gelu_out = _scalar(sd, f"{b}.mlp.qact1.act_scaling_factor")
        blocks.append(
            {
                "norm1": _norm(sd, f"{b}.norm1"),
                "s_qact1": s_qact1,
                "qkv": _linear(sd, f"{b}.attn.qkv", s_qact1),
                "s_attn_qact1": _scalar(
                    sd, f"{b}.attn.qact1.act_scaling_factor"
                ),
                "s_attn_sm_in": _scalar(
                    sd, f"{b}.attn.qact_attn1.act_scaling_factor"
                ),
                "s_attn_out": s_attn_out,
                "proj": _linear(sd, f"{b}.attn.proj", s_attn_out),
                "s_attn_proj": _scalar(
                    sd, f"{b}.attn.qact3.act_scaling_factor"
                ),
                "s_res1": _scalar(sd, f"{b}.qact2.act_scaling_factor"),
                "norm2": _norm(sd, f"{b}.norm2"),
                "s_qact3": s_qact3,
                "fc1": _linear(sd, f"{b}.mlp.fc1", s_qact3),
                "s_gelu_in": _scalar(
                    sd, f"{b}.mlp.qact_gelu.act_scaling_factor"
                ),
                "s_gelu_out": s_gelu_out,
                "fc2": _linear(sd, f"{b}.mlp.fc2", s_gelu_out),
                "s_mlp_out": _scalar(
                    sd, f"{b}.mlp.qact2.act_scaling_factor"
                ),
                "s_res2": _scalar(sd, f"{b}.qact4.act_scaling_factor"),
            }
        )
    a["blocks"] = blocks

    a["norm"] = _norm(sd, "norm")
    a["head_in_scale"] = _scalar(sd, "qact2.act_scaling_factor")
    a["head"] = _linear(sd, "head", a["head_in_scale"])
    return a
