"""Swin integer-only deployment: freeze + inference engine.

Extends the deployment path (the reference only ever deployed DeiT via
TVM; Swin deployment is new capability). Same design as ``engine.py``:
int8 MXU matmuls, static requant ratios, the shared integer
nonlinearities. The relative-position bias is pre-gathered and
pre-requantized into the attention scale at freeze time, so at runtime
the dual-scale merge (swin_quant.py:142-149) is a single integer add;
the SW-MSA −100 mask likewise folds to a precomputed integer addend.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from ..models.swin import relative_position_index, sw_attn_mask, window_partition, window_reverse
from ..ops import (
    DEPLOY,
    gelu_int_lanes_valid,
    shiftgelu,
    shiftgelu_stable_int_deploy,
    shiftmax,
    shiftmax_int_deploy,
)
from .convert import _act_scale, _freeze_layernorm, _freeze_linear
from .engine import (
    _INT8,
    _INT16,
    _layernorm_requant,
    _linear,
    _mat,
    _pad_axis,
    _requant,
    _scale,
)
from ..kernels.window_attention_fused import fused_int8_window_attention


@jax.jit
def _jit_scale_ops(table, s_table, s_bias):
    """Device-side: quantize the rel-pos-bias table at s_table and the
    table→bias requant ratio (divisions must run with the device's f32
    lowering, not host numpy — TPU exact-tie behavior differs)."""
    tq = jnp.clip(jnp.round(table / s_table), -128, 127)
    return tq, s_table / s_bias


@jax.jit
def _jit_mask_int(mask, s_bias):
    return mask / s_bias


def freeze_swin(model, variables) -> dict:
    params = variables["params"]
    stats = variables["quant_stats"]
    D = model.embed_dim
    grid = model.img_size // model.patch_size

    a = {
        "config": dict(
            img_size=model.img_size,
            patch_size=model.patch_size,
            embed_dim=D,
            depths=tuple(model.depths),
            num_heads=tuple(model.num_heads),
            window_size=model.window_size,
            mlp_ratio=model.mlp_ratio,
            num_classes=model.num_classes,
            gelu_stable=getattr(model, "gelu_stable", False),
        )
    }

    a["input_scale"] = _act_scale(stats["qact_input"], 8)
    a["patch_embed"] = _freeze_linear(params["patch_embed"]["proj"], a["input_scale"])
    a["s_before_norm"] = _act_scale(stats["qact_before_norm"], 8)
    a["patch_norm"] = _freeze_layernorm(params["patch_norm"], D)
    a["embed_scale"] = _act_scale(stats["qact_embed"], 16)
    a["tokens_scale"] = _act_scale(stats["qact1"], 16)

    stages = []
    k = 0
    for i, depth in enumerate(model.depths):
        dim = D * 2**i
        res = grid // 2**i
        blocks = []
        for j in range(depth):
            name = f"layers_{i}_blocks_{j}"
            bp, bs = params[name], stats[name]
            ws = min(model.window_size, res)
            shift = 0 if j % 2 == 0 else model.window_size // 2
            if res <= model.window_size:
                shift = 0

            s_qact1 = _act_scale(bs["qact1"], 8)
            sa1 = _act_scale(bs["attn"]["qact1"], 8)
            s_attn1 = _act_scale(bs["attn"]["qact_attn1"], 8)
            s_table = _act_scale(bs["attn"]["qact_table"], 8)
            s_bias = _act_scale(bs["attn"]["qact2"], 8)
            s_q3 = _act_scale(bs["attn"]["qact3"], 8)
            s_q4 = _act_scale(bs["attn"]["qact4"], 16)
            s_res1 = _act_scale(bs["qact2"], 16)
            s_qact3 = _act_scale(bs["qact3"], 8)
            s_gelu_in = _act_scale(bs["mlp"]["qact_gelu"], 8)
            s_gelu_out = _act_scale(bs["mlp"]["qact1"], 8)
            s_mlp_out = _act_scale(bs["mlp"]["qact2"], 16)
            s_res2 = _act_scale(bs["qact4"], 16)

            # pre-gather + pre-requantize the relative position bias
            # into the post-merge scale s_bias (int addend). Quantize
            # and requantize through jitted device ops so the divisions
            # match the simulator's on-device lowering (same policy as
            # _jit_freeze_linear).
            table = np.asarray(
                bp["attn"]["relative_position_bias_table"], np.float32
            )
            tq, ratio_tb = _jit_scale_ops(table, s_table, s_bias)
            idx = relative_position_index(ws).reshape(-1)
            N = ws * ws
            nH = model.num_heads[i]
            bias_q = np.asarray(tq)[idx].reshape(N, N, nH).transpose(2, 0, 1)
            bias_req = np.round(
                bias_q * np.float32(ratio_tb)
            ).astype(np.float32)

            mask = sw_attn_mask(res, res, ws, shift)
            mask_int = (
                np.asarray(_jit_mask_int(mask, s_bias), np.float32)
                if mask is not None
                else None
            )

            blocks.append(
                {
                    "res": res, "ws": ws, "shift": shift, "heads": nH,
                    "norm1": _freeze_layernorm(bp["norm1"], dim),
                    "s_qact1": s_qact1,
                    "qkv": _freeze_linear(bp["attn"]["qkv"], s_qact1),
                    "s_attn_qact1": sa1,
                    "s_attn1": s_attn1,
                    "bias_req": bias_req,
                    "s_bias": s_bias,
                    "mask_int": mask_int,
                    "s_attn_out": s_q3,
                    "proj": _freeze_linear(bp["attn"]["proj"], s_q3),
                    "s_attn_proj": s_q4,
                    "s_res1": s_res1,
                    "norm2": _freeze_layernorm(bp["norm2"], dim),
                    "s_qact3": s_qact3,
                    "fc1": _freeze_linear(bp["mlp"]["fc1"], s_qact3),
                    "s_gelu_in": s_gelu_in,
                    "s_gelu_out": s_gelu_out,
                    "fc2": _freeze_linear(bp["mlp"]["fc2"], s_gelu_out),
                    "s_mlp_out": s_mlp_out,
                    "s_res2": s_res2,
                }
            )
            k += 1
        stage = {"blocks": blocks}
        if i < len(model.depths) - 1:
            dname = f"layers_{i}_downsample"
            s_dq1 = _act_scale(stats[dname]["qact1"], 8)
            stage["downsample"] = {
                "res": res, "dim": dim,
                "norm": _freeze_layernorm(params[dname]["norm"], 4 * dim),
                "s_qact1": s_dq1,
                "reduction": _freeze_linear(params[dname]["reduction"], s_dq1),
                "s_out": _act_scale(stats[dname]["qact2"], 8),
            }
        stages.append(stage)
    a["stages"] = stages

    nf = D * 2 ** (len(model.depths) - 1)
    a["norm"] = _freeze_layernorm(params["norm"], nf)
    a["s_qact2"] = _act_scale(stats["qact2"], 8)
    a["s_qact3"] = _act_scale(stats["qact3"], 8)
    a["head"] = _freeze_linear(params["head"], a["s_qact3"])
    return a


def _proj_out(c8, blk, H, hd, C):
    """Attention projection on the head-batched (Bw, H, N, hd) int8
    context: contract (H, hd) with the weight reshaped (H, hd, C) — row
    h·hd+d matches the simulator's head-merge reshape."""
    w = jnp.asarray(blk["proj"]["w"]).reshape(H, hd, C)
    acc = jax.lax.dot_general(
        c8, w,
        dimension_numbers=(((1, 3), (0, 1)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if "b" in blk["proj"]:
        acc = acc + jnp.asarray(blk["proj"]["b"])
    sap = _scale(blk["s_attn_proj"])
    out = _requant(
        acc, _scale(blk["proj"]["out_scale"]) / sap, *_INT16, jnp.float32
    )
    return out, sap


def build_swin_infer(artifact: dict, use_pallas: bool | None = None,
                     pallas_interpret: bool = False,
                     sm_int_lanes: bool = False,
                     gelu_int_lanes: bool = False,
                     sm_packed: bool = False,
                     scores_f32: bool = False,
                     qkv_hmajor: bool = False,
                     qkv_wmajor: bool = False,
                     win_pad: int = 0,
                     pallas_ops: tuple = ()):
    """Jittable int8 Swin inference: float NHWC images → logits.

    Layout probes for the profiled score-plane copy tax around the
    N=49 window dots (both bit-identical to the default path,
    tests/test_swin_deploy.py):

    ``qkv_hmajor`` — materialize q/k/v head-major (Bw, H, N, hd) int8
    once (one explicit relayout each) so both attention dots and the
    projection consume leading-batch contiguous planes, instead of
    letting XLA insert its own copies around the (0, 2)-batched dots.

    ``win_pad`` — zero-pad the window token axis N → win_pad before
    the score dot so the (…, N, N) score planes are sublane-aligned
    (49 → 56/64 kills the T(8,128) sublane padding). Exactness: padded
    k/v rows are zero; padded score columns are forced to a −2^20
    sentinel and their exp zeroed via the shiftmax ``col_valid`` hook
    (the fused kernel's own mechanism), so valid rows' probabilities,
    sums, and context are bit-equal; padded context rows are sliced
    off before the projection.

    ``qkv_wmajor`` — the round-4 closure's named untried route: fuse
    the head-split into the qkv GEMM itself at trace level. The
    projection is expressed as ``dot_general(w(3,H,hd,C), x(Bw,N,C))``
    → qkv already head-major ``(3, H, hd, Bw, N)`` straight out of the
    MXU (requant epilogue fused, per-channel ratios reshaped along);
    the score dots then batch over (H, Bw) on GEMM-native planes and
    the projection contracts (H, hd) directly — no head-split reshape
    exists anywhere for XLA to re-lay-out around the N=49 window dots.
    Bit-identical: same int32 accumulations, same per-element requant
    ratios, only the tensor layout differs.

    ``pallas_ops=("attention",)`` fuses the whole window-attention tail
    (q@kᵀ → requant → bias merge → mask → 8-bit Shiftmax → int8 @V →
    requant) into one kernel per (window, head) — the (N, N) score
    tensor never reaches HBM. Batch-1 latency candidate (the regime
    where the ViT fused kernel wins); bit-identical to the XLA path in
    interpret mode (tests/test_swin_deploy.py)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    p_attn = use_pallas and "attention" in pallas_ops
    cfg = artifact["config"]
    if p_attn and any(
        blk["ws"] * blk["ws"] > 256
        for stage in artifact["stages"]
        for blk in stage["blocks"]
    ):
        # kernels/window_attention_fused.py: the 2-limb row sum is
        # exact only for <=256 tokens (window_size <= 16); oversize
        # windows take the XLA path (3-limb exact sums) per block.
        import warnings

        warnings.warn(
            "fused window attention disabled for windows > 16 "
            "(exact-row-sum bound); those blocks use the XLA path",
            stacklevel=2,
        )
    gelu_stable = bool(cfg.get("gelu_stable", False))
    p = cfg["patch_size"]
    interpret = pallas_interpret
    if qkv_wmajor and (win_pad or qkv_hmajor or scores_f32 or p_attn):
        raise ValueError(
            "qkv_wmajor is a standalone layout probe — do not combine "
            "with win_pad/qkv_hmajor/scores_f32/pallas attention"
        )

    def _attention_wmajor(x8, blk):
        """qkv_wmajor probe: head-split fused into the GEMM output.

        ``dot_general(w(3,H,hd,C), x8(Bw,N,C))`` emits qkv head-major
        (3, H, hd, Bw, N) int32; the fused requant epilogue applies the
        same per-channel ratios reshaped (3, H, hd, 1, 1). Scores batch
        over (H, Bw) on these GEMM-native planes; the projection
        contracts (H, hd) directly back to (Bw, N, C). Value path is
        element-for-element identical to the default (int32 dots are
        exactly associative; requant ratios unchanged) — pinned by
        tests/test_swin_deploy.py."""
        Bw, N, C = x8.shape
        H = blk["heads"]
        hd = C // H

        w3 = jnp.asarray(blk["qkv"]["w"]).T.reshape(3, H, hd, C)
        acc = jax.lax.dot_general(
            w3, x8,
            dimension_numbers=(((3,), (2,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (3, H, hd, Bw, N)
        if "b" in blk["qkv"]:
            acc = acc + jnp.asarray(blk["qkv"]["b"]).reshape(3, H, hd, 1, 1)
        sa1 = _scale(blk["s_attn_qact1"])
        ratio = (_scale(blk["qkv"]["out_scale"]) / sa1).reshape(
            3, H, hd, 1, 1
        )
        z = _requant(acc, ratio, *_INT8, jnp.int8)
        q, k, v = z[0], z[1], z[2]  # (H, hd, Bw, N)

        attn = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((0, 2), (0, 2))),
            preferred_element_type=jnp.int32,
        )  # (H, Bw, Nq, Nk)
        s_attn = sa1 * sa1 * np.float32(float(hd) ** -0.5)
        s1 = _scale(blk["s_attn1"])
        a8 = _requant(attn, s_attn / s1, *_INT8, jnp.float32)

        sb = _scale(blk["s_bias"])
        bias = jnp.asarray(blk["bias_req"])  # (H, N, N)
        a8 = jnp.clip(jnp.round(a8 * (s1 / sb)) + bias[:, None], *_INT8)
        a8 = _mat(a8, jnp.int8).astype(jnp.float32)
        if blk["mask_int"] is not None:
            m = jnp.asarray(blk["mask_int"])  # (nW, N, N)
            nW = m.shape[0]
            a8 = (
                a8.reshape(H, Bw // nW, nW, N, N) + m[None, None]
            ).reshape(H, Bw, N, N)
            sm, _ = shiftmax(
                a8, sb, out_bits=8, interp=DEPLOY,
                static_p=math.ceil(1.0 / float(blk["s_bias"])),
                in_lo=-math.inf,
            )
        else:
            sm, _ = shiftmax(
                a8, sb, out_bits=8, interp=DEPLOY,
                static_p=math.ceil(1.0 / float(blk["s_bias"])),
            )
        s_sm = 1.0 / 2.0**7

        sm8 = sm.astype(jnp.int8)
        ctx = jax.lax.dot_general(
            sm8, v,
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.int32,
        )  # (H, Bw, N, hd)
        s_ctx = s_sm * sa1
        so = _scale(blk["s_attn_out"])
        c8 = _mat(_requant(ctx, s_ctx / so, *_INT8, jnp.int8), jnp.int8)

        wp = jnp.asarray(blk["proj"]["w"]).reshape(H, hd, C)
        acc = jax.lax.dot_general(
            c8, wp,
            dimension_numbers=(((0, 3), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (Bw, N, C)
        if "b" in blk["proj"]:
            acc = acc + jnp.asarray(blk["proj"]["b"])
        sap = _scale(blk["s_attn_proj"])
        out = _requant(
            acc, _scale(blk["proj"]["out_scale"]) / sap, *_INT16,
            jnp.float32,
        )
        return out, sap

    def _attention(x8, blk):
        """x8: (B·nW, N, C) int8 windows at s_qact1."""
        if qkv_wmajor:
            return _attention_wmajor(x8, blk)
        Bw, N, C = x8.shape
        H = blk["heads"]
        hd = C // H

        acc = _linear(x8, blk["qkv"])
        sa1 = _scale(blk["s_attn_qact1"])
        z = _requant(
            acc, _scale(blk["qkv"]["out_scale"]) / sa1, *_INT8, jnp.int8
        )
        # Layout-free head handling (the ViT engine's profiled pattern,
        # engine.py:_block): slice the feature axis, keep (Bw, N, H, hd),
        # and put the head axis in the dot_generals' batch dims — the
        # explicit (2,0,3,1,4) head-split transpose this replaces was
        # ~15% of the whole Swin engine (s8/s32 relayout copies).
        q = z[..., :C].reshape(Bw, N, H, hd)
        k = z[..., C:2 * C].reshape(Bw, N, H, hd)
        v = z[..., 2 * C:].reshape(Bw, N, H, hd)

        if p_attn and N <= 256:
            # fully-fused window attention: one kernel per
            # (window, head); scores never reach HBM. Kernel parameters
            # are compile-time host floats (the ViT p_attn pattern).
            # N <= 256: the kernel's exact-row-sum bound (see builder).
            h_sa1 = float(blk["s_attn_qact1"])
            h_sattn = np.float32(h_sa1 * h_sa1) * np.float32(
                float(hd) ** -0.5
            )
            h_s1 = float(blk["s_attn1"])
            h_sb = float(blk["s_bias"])
            h_so = float(blk["s_attn_out"])
            s_ctx = np.float32(1.0 / 2.0**7) * np.float32(h_sa1)
            Npad = -(-N // 128) * 128
            G = Bw * H
            qp = _pad_axis(q.transpose(0, 2, 1, 3), 2, Npad).reshape(G, Npad, hd)
            kp = _pad_axis(k.transpose(0, 2, 1, 3), 2, Npad).reshape(G, Npad, hd)
            vp = _pad_axis(v.transpose(0, 2, 1, 3), 2, Npad).reshape(G, Npad, hd)
            bias_pad = np.zeros((H, Npad, Npad), np.float32)
            bias_pad[:, :N, :N] = np.asarray(blk["bias_req"], np.float32)
            mask_pad = None
            if blk["mask_int"] is not None:
                m = np.asarray(blk["mask_int"], np.float32)
                mask_pad = np.zeros((m.shape[0], Npad, Npad), np.float32)
                mask_pad[:, :N, :N] = m
                mask_pad = jnp.asarray(mask_pad)
            c8 = fused_int8_window_attention(
                qp, kp, vp, jnp.asarray(bias_pad), mask_pad,
                r1=float(h_sattn / h_s1),
                rb=float(np.float32(h_s1) / np.float32(h_sb)),
                scale=h_sb,
                r_out=float(s_ctx / np.float32(h_so)),
                n_valid=N,
                heads=H,
                interpret=interpret,
            ).reshape(Bw, H, Npad, hd)[:, :, :N]
            return _proj_out(c8, blk, H, hd, C)

        Nv = N
        col_valid = None
        if win_pad and N < win_pad:
            # probe (a): tile-aligned score planes; exactness per the
            # builder docstring (zero k/v pads + col_valid shiftmax)
            q = _pad_axis(q, 1, win_pad)
            k = _pad_axis(k, 1, win_pad)
            v = _pad_axis(v, 1, win_pad)
            N = win_pad
            col_valid = (jnp.arange(N) < Nv)[None, None, None, :]

        if qkv_hmajor:
            # probe (b): one explicit head-major relayout per tensor;
            # the dots then batch over the leading (Bw, H) axes
            q = _mat(q.transpose(0, 2, 1, 3), jnp.int8)
            k = _mat(k.transpose(0, 2, 1, 3), jnp.int8)
            v = _mat(v.transpose(0, 2, 1, 3), jnp.int8)
            qk_dims = (((3,), (3,)), ((0, 1), (0, 1)))
            av_dims = (((3,), (2,)), ((0, 1), (0, 1)))
        else:
            qk_dims = (((3,), (3,)), ((0, 2), (0, 2)))
            av_dims = (((3,), (1,)), ((0, 1), (0, 2)))

        if scores_f32:
            # bf16×bf16→f32 MXU dot instead of int8→s32: **bit-exact**
            # for these window shapes — int8 carriers are exactly
            # representable in bf16 (|v| ≤ 128 < 2^8 mantissa bound),
            # every product ≤ 128² = 2^14, and the f32 accumulator
            # stays exact while hd·2^14 < 2^24 (gated below). The s32
            # score tensor (and its layout copies around the N=49
            # batched dots — the profiled ~5 ms Swin pathology) never
            # exists; the requant consumes the f32 directly, which is
            # the same value the implicit s32→f32 promotion produced.
            assert hd * 128 * 128 < 2**24, hd
            attn = jax.lax.dot_general(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                dimension_numbers=qk_dims,
                preferred_element_type=jnp.float32,
            )  # (Bw, H, N, N)
        else:
            attn = jax.lax.dot_general(
                q, k,
                dimension_numbers=qk_dims,
                preferred_element_type=jnp.int32,
            )  # (Bw, H, N, N)
        s_attn = sa1 * sa1 * np.float32(float(hd) ** -0.5)
        s1 = _scale(blk["s_attn1"])
        a8 = _requant(attn, s_attn / s1, *_INT8, jnp.float32)

        # dual-scale bias merge, pre-requantized at freeze time
        sb = _scale(blk["s_bias"])
        bias = jnp.asarray(blk["bias_req"])
        if bias.shape[-1] < N:  # win_pad: zero-pad the frozen bias
            bias = _pad_axis(_pad_axis(bias, 1, N), 2, N)
        a8 = jnp.clip(jnp.round(a8 * (s1 / sb)) + bias[None], *_INT8)
        # s8 materialization of the merged scores; the SW-MSA mask addend
        # (−100/s_bias, NOT integral) must be applied after, in f32.
        a8 = _mat(a8, jnp.int8).astype(jnp.float32)
        if blk["mask_int"] is not None:
            m = jnp.asarray(blk["mask_int"])
            if m.shape[-1] < N:  # win_pad
                m = _pad_axis(_pad_axis(m, 1, N), 2, N)
            nW = m.shape[0]
            a8 = (
                a8.reshape(Bw // nW, nW, H, N, N) + m[None, :, None]
            ).reshape(Bw, H, N, N)
            if col_valid is not None:
                a8 = jnp.where(col_valid, a8, -(2.0**20))
            # mask already added: the int8 domain bound is broken, so
            # only the p-dependent elisions engage (in_lo=-inf)
            sm, _ = shiftmax(
                a8, sb, out_bits=8, interp=DEPLOY,
                static_p=math.ceil(1.0 / float(blk["s_bias"])),
                in_lo=-math.inf, col_valid=col_valid,
            )
        else:
            if col_valid is not None:
                a8 = jnp.where(col_valid, a8, -(2.0**20))
            # int32-lane softmax for unmasked windows when the frozen
            # scale admits it (bit-identical; see ops/shiftmax.py)
            h_p = math.floor(1.0 / float(blk["s_bias"]))
            if col_valid is not None:
                # win_pad: the generic chain is the only col_valid twin
                sm, _ = shiftmax(
                    a8, sb, out_bits=8, interp=DEPLOY,
                    static_p=math.ceil(1.0 / float(blk["s_bias"])),
                    in_lo=-math.inf, col_valid=col_valid,
                )
            elif (
                sm_int_lanes and not sm_packed and 1 <= h_p <= 500
                and a8.shape[-1] <= 256  # int twin's row-sum bound
            ):
                sm, _ = shiftmax_int_deploy(a8, sb, out_bits=8)
            else:
                # sm_packed: u16 pass-boundary exp (value-identical;
                # ops/shiftmax packed_exp). Unmasked windows only — the
                # SW-MSA branch's f32 mask addend breaks the integer
                # (m, k) decomposition the packing encodes.
                sm, _ = shiftmax(
                    a8, sb, out_bits=8, interp=DEPLOY,
                    packed_exp=sm_packed,
                    static_p=math.ceil(1.0 / float(blk["s_bias"])),
                )
        s_sm = 1.0 / 2.0**7

        # attn (Bw,H,N,K) @ v (Bw,K,H,hd) with batch dims (0,1)/(0,2):
        # ctx (Bw,H,N,hd), no transposed copies (engine.py pattern)
        if scores_f32:
            # same exactness argument as q@kᵀ: probs ∈ [0, 127], v int8,
            # N·127·128 < 2^24 for any realistic window
            assert N * 128 * 128 < 2**24, N
            ctx = jax.lax.dot_general(
                sm.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                dimension_numbers=av_dims,
                preferred_element_type=jnp.float32,
            )
        else:
            sm8 = sm.astype(jnp.int8)  # 8-bit softmax fits int8 ([0,127])
            ctx = jax.lax.dot_general(
                sm8, v,
                dimension_numbers=av_dims,
                preferred_element_type=jnp.int32,
            )
        s_ctx = s_sm * sa1

        so = _scale(blk["s_attn_out"])
        c8 = _mat(_requant(ctx, s_ctx / so, *_INT8, jnp.int8), jnp.int8)
        if Nv != N:  # win_pad: drop the padded context rows
            c8 = c8[:, :, :Nv]
        return _proj_out(c8, blk, H, hd, C)

    def _block(x, s_x, blk):
        B, L, C = x.shape
        res, ws, shift = blk["res"], blk["ws"], blk["shift"]

        s1 = blk["s_qact1"]
        y = _layernorm_requant(
            x.astype(jnp.float32), blk["norm1"], s1, 8, *_INT8,
            use_pallas, interpret,
        ).astype(jnp.int8)

        g = y.reshape(B, res, res, C)
        if shift > 0:
            g = jnp.roll(g, (-shift, -shift), axis=(1, 2))
        xw = window_partition(g, ws)

        aw, sap = _attention(xw, blk)

        # s16 materialization before the window-reverse/roll relayouts:
        # the copies then move 2-byte integers, not the f32 carrier
        aw = _mat(aw, jnp.int16).astype(jnp.float32)
        g = window_reverse(aw, ws, res, res)
        if shift > 0:
            g = jnp.roll(g, (shift, shift), axis=(1, 2))
        a = g.reshape(B, L, C)

        sr1 = _scale(blk["s_res1"])
        x = _mat(
            jnp.clip(
                jnp.round(a * (sap / sr1))
                + jnp.round(x.astype(jnp.float32) * (s_x / sr1)),
                *_INT16,
            ),
            jnp.int16,
        ).astype(jnp.float32)
        s_x = sr1  # identity branch of the next residual is at sr1 now

        s3 = blk["s_qact3"]
        y = _layernorm_requant(
            x, blk["norm2"], s3, 8, *_INT8, use_pallas, interpret
        ).astype(jnp.int8)

        acc = _linear(y, blk["fc1"])
        sg_in = _scale(blk["s_gelu_in"])
        sg_out = _scale(blk["s_gelu_out"])
        gq = _mat(
            _requant(
                acc, _scale(blk["fc1"]["out_scale"]) / sg_in, *_INT8,
                jnp.float32,
            ),
            jnp.int8,
        ).astype(jnp.float32)
        g_static_p = math.ceil(1.0 / (1.702 * float(blk["s_gelu_in"])))
        if (
            gelu_int_lanes
            and gelu_stable
            and gelu_int_lanes_valid(g_static_p)
        ):
            # int32-lane twin — bit-identical to the f32 chain
            # (ops/shiftgelu, TestShiftgeluStableIntDeploy)
            gl, _ = shiftgelu_stable_int_deploy(
                gq, sg_in, out_bits=8, static_p=g_static_p
            )
        else:
            gl, _ = shiftgelu(
                gq, sg_in, out_bits=8, interp=DEPLOY,
                static_p=g_static_p,
                stable=gelu_stable,
            )
        s_g = sg_in * np.float32(1.0 / 2.0**7)
        g8 = _requant(gl, s_g / sg_out, *_INT8, jnp.int8)

        acc = _linear(g8, blk["fc2"])
        smo = _scale(blk["s_mlp_out"])
        m = _requant(
            acc, _scale(blk["fc2"]["out_scale"]) / smo, *_INT16, jnp.float32
        )

        sr2 = _scale(blk["s_res2"])
        x = _mat(
            jnp.clip(
                jnp.round(m * (smo / sr2)) + jnp.round(x * (s_x / sr2)),
                *_INT16,
            ),
            jnp.int16,
        ).astype(jnp.float32)
        return x, sr2

    def _downsample(x, s_x, ds):
        B, L, C = x.shape
        res = ds["res"]
        g = x.reshape(B, res, res, C)
        parts = [g[:, 0::2, 0::2], g[:, 1::2, 0::2],
                 g[:, 0::2, 1::2], g[:, 1::2, 1::2]]
        q = jnp.concatenate(parts, -1).reshape(B, L // 4, 4 * C)
        s1 = ds["s_qact1"]
        y = _layernorm_requant(
            q.astype(jnp.float32), ds["norm"], s1, 8, *_INT8,
            use_pallas, interpret,
        ).astype(jnp.int8)
        acc = _linear(y, ds["reduction"])
        so = _scale(ds["s_out"])
        out = _requant(
            acc, _scale(ds["reduction"]["out_scale"]) / so, *_INT8,
            jnp.float32,
        )
        return out, so

    def infer(images):
        B = images.shape[0]
        x = jnp.clip(
            jnp.round(images / _scale(artifact["input_scale"])), *_INT8
        ).astype(jnp.int8)

        gh = cfg["img_size"] // p
        x = x.reshape(B, gh, p, gh, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gh, p * p * 3)
        pe = artifact["patch_embed"]
        acc = _linear(x, pe)
        sbn = _scale(artifact["s_before_norm"])
        x = _requant(acc, _scale(pe["out_scale"]) / sbn, *_INT8, jnp.float32)

        # patch norm → 16-bit embed scale → 16-bit token scale
        pn = artifact["patch_norm"]
        from ..ops import int_layernorm

        D = cfg["embed_dim"]
        y, _ = int_layernorm(x, jnp.ones((D,)), jnp.zeros((D,)), interp=DEPLOY)
        y = y + jnp.asarray(pn["bias_int"])
        s_e = _scale(artifact["embed_scale"])
        x = _requant(y, _scale(pn["out_scale"]) / s_e, *_INT16, jnp.float32)
        s_tok = _scale(artifact["tokens_scale"])
        x = jnp.clip(jnp.round(x * (s_e / s_tok)), *_INT16)
        s_x = s_tok

        for stage in artifact["stages"]:
            for blk in stage["blocks"]:
                x, s_x = _block(x, s_x, blk)
            if "downsample" in stage:
                x, s_x = _downsample(x, s_x, stage["downsample"])

        s2 = artifact["s_qact2"]
        y = _layernorm_requant(
            x.astype(jnp.float32), artifact["norm"], s2, 8, *_INT8,
            use_pallas, interpret,
        )
        y = y.astype(jnp.float32)
        # token-mean pool then requant to the head scale
        y = jnp.mean(y, axis=1)
        s3 = _scale(artifact["s_qact3"])
        y8 = _requant(y, _scale(s2) / s3, *_INT8, jnp.int8)
        head = artifact["head"]
        logits = _linear(y8, head)
        return logits.astype(jnp.float32) * head["out_scale"]

    return infer
