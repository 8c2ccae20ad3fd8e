"""Integer-only inference engine (the TVM deployment-path analogue).

Replaces the reference's Relay graph builder + auto-scheduled CUDA
kernels (/root/reference/TVM_benchmark/models/quantized_vit.py:180-274,
evaluate_latency.py:55-88) with an XLA/Pallas integer graph:

* every weight matmul runs on the MXU's native int8 path
  (``lax.dot_general`` on int8 operands, int32 accumulation);
* the attention-probabilities × V matmul (16-bit × 8-bit, no native MXU
  mode) is decomposed base-256 into two int8 MXU matmuls plus a rank-1
  correction — exact in int32, unlike the reference's float path;
* the integer nonlinearity chains run as fused Pallas kernels
  (``ivit_tpu.kernels``): requant→Shiftmax→split, requant→ShiftGELU→
  requant, I-LayerNorm→requant — one VMEM pass each, bit-identical to
  the pure-JAX ops they replace (tested);
* requantization ratios are compile-time constants (the dyadic
  multiply+shift of ``fixedpoint_mul`` with scales frozen), folded and
  fused by XLA;
* the only float op is the final logit dequantization, mirroring the
  reference (quantized_vit.py:265-271).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import (
    fused_layernorm_requant,
    fused_requant_shiftgelu,
    fused_requant_shiftmax,
)
from ..kernels.linear_gelu_fused import fused_linear_shiftgelu
from ..kernels.attention_fused import fused_int8_attention
from ..kernels.attention_fused_v2 import fused_int8_attention_v2
from ..ops import (
    DEPLOY,
    int_layernorm,
    shiftgelu,
    shiftmax,
    gelu_int_lanes_valid,
    shiftgelu_stable_int_deploy,
    shiftmax_int_deploy,
)

_INT8 = (-128, 127)
_INT16 = (-(2**15), 2**15 - 1)


def _requant(acc, ratio, lo, hi, dtype):
    """Accumulator → integer at the target scale (static ``ratio``;
    XLA fuses this epilogue into the producing matmul)."""
    y = jnp.round(acc.astype(jnp.float32) * ratio)
    return jnp.clip(y, lo, hi).astype(dtype)


def _scale(v):
    """Pin a frozen scale as a runtime device value.

    Every ratio division downstream then executes on the deployment
    device with the same lowering as the simulator's (which divides
    live traced scales under jit). Left as a host/compile-time
    constant, XLA would fold the division with host-evaluator
    semantics, whose exact-tie behavior differs from the TPU's
    reciprocal-multiply division — flipping requant boundaries vs sim
    (the round-1 residual TPU-parity gap; weight freezing was moved
    on-device for the same reason, convert._jit_freeze_linear)."""
    return jax.lax.optimization_barrier(jnp.asarray(v, jnp.float32))


def _mat(x, dtype):
    """Pin a compact integer materialization of an integer-valued f32
    carrier (profiler-guided): without the barrier XLA materializes the
    f32 carrier at fusion boundaries — 4× the HBM bytes for int8-valued
    tensors, which dominates the engine (the chains are HBM-bound, not
    VPU-bound). The conversion is exact for in-range integer values, so
    bit-parity with the simulator is untouched; consumers convert back
    to f32 inside their own fusions."""
    return jax.lax.optimization_barrier(x.astype(dtype))


def _requant_strict(acc, ratio, lo, hi, dtype):
    """Integer-ISA-exact requant: dyadic (m, e) multiply+shift in 16-bit
    limbs (core/dyadic.py), round-half-away — the semantics the
    reference's TVM path uses (fixedpoint_mul / qnn.requantize). Slower
    than the f32 epilogue; selectable via ``strict_dyadic``."""
    from ..core.dyadic import dyadic_requant

    y = dyadic_requant(
        acc.astype(jnp.int32), jnp.asarray(ratio, jnp.float32)
    )
    return jnp.clip(y, lo, hi).astype(dtype)


def _int8_matmul(x_int8, w_int8):
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
    return y  # int32 at per-channel scale layer["out_scale"]


def _pad_axis(x, axis, target):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, pad)


def _layernorm_requant(x, norm, s_out, bits, lo, hi, use_pallas, interpret):
    """I-LayerNorm (frozen γ/β) + requant. x: f32 carrier (..., C).

    ``s_out`` may be a host float or an already-pinned device scale;
    the ratio division runs on the device (see ``_scale``)."""
    C = x.shape[-1]
    ratio = _scale(norm["out_scale"]) / _scale(s_out)
    if use_pallas and C % 128 == 0 and bits == 8:
        flat = x.reshape(-1, C)
        out = fused_layernorm_requant(
            flat,
            jnp.asarray(norm["bias_int"]),
            ratio,
            bits=bits,
            interpret=interpret,
        )
        return out.reshape(x.shape)
    y, _ = int_layernorm(
        x, jnp.ones((C,)), jnp.zeros((C,)), interp=DEPLOY
    )
    y = y + jnp.asarray(norm["bias_int"])
    return _requant(y, ratio, lo, hi, jnp.int8 if bits == 8 else jnp.float32)


# Measured end-to-end on v5e (batch 128, DeiT-S): XLA's own fusions beat
# each fused Pallas kernel here (per-kernel wins did not survive the lost
# fusion boundaries around them), so none are on by default. The kernels
# stay available and bit-exact for hardware where the trade flips.
DEFAULT_PALLAS_OPS: tuple = ()


def build_vit_infer(artifact: dict, use_pallas: bool | None = None,
                    pallas_interpret: bool = False,
                    pallas_ops: tuple = DEFAULT_PALLAS_OPS,
                    strict_dyadic: bool = False,
                    attn_v_mode: str = "f32",
                    sm_int16: bool = False,
                    sm_split: bool = False,
                    sm_packed: bool = False,
                    sm_int_lanes: bool = False,
                    proj_4d: bool = False,
                    res_split: bool = False,
                    gelu_int_lanes: bool = False,
                    qkv_t: bool | str = False):
    """Build the jittable int8 inference fn: float NHWC images → logits.

    ``use_pallas=False`` selects the pure-XLA path (bit-identical; used
    as the oracle in tests); ``None`` auto-enables Pallas off-CPU.
    ``pallas_ops`` opts chains into the fused Pallas kernels — measured
    on v5e at batch 128, XLA's own fusions win everywhere, so the
    default is NO Pallas ops (``DEFAULT_PALLAS_OPS = ()``); the fused
    attention kernel wins at batch 1 (``pallas_ops=("attention",)``).
    The standalone softmax kernel emits the base-256 (hi, lo) split and
    therefore only engages with ``attn_v_mode="exact"``. Ops whose
    shapes don't meet Pallas tiling fall back automatically.
    """
    if sm_packed and sm_split:
        raise ValueError(
            "sm_packed and sm_split are alternative softmax pass-"
            "boundary strategies (u16 packing vs recompute) — pass at "
            "most one"
        )
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if strict_dyadic:
        # integer-ISA-exact requant epilogues; Pallas kernels use the
        # f32 epilogue internally, so strict mode runs pure-XLA.
        use_pallas = False
    if "softmax" in pallas_ops and attn_v_mode != "exact":
        import warnings

        warnings.warn(
            'pallas_ops=("softmax",) produces the base-256 split for '
            'the exact @V path and is a no-op with attn_v_mode="f32"; '
            'pass attn_v_mode="exact" to engage it',
            stacklevel=2,
        )
    rq = _requant_strict if strict_dyadic else _requant
    # "f32": HIGHEST-precision f32 matmul for softmax@V — bit-identical
    # to the QAT simulator's matmul (which is also f32 HIGHEST) and
    # fastest end-to-end on v5e. "exact": base-256 split into two int8
    # MXU matmuls + rank-1 correction — exact int32 semantics (exceeds
    # the simulator's fidelity above 2^24), ~20% slower.
    assert attn_v_mode in ("f32", "exact"), attn_v_mode
    p_attn = use_pallas and "attention" in pallas_ops
    p_attn2 = use_pallas and "attention2" in pallas_ops and not p_attn
    p_softmax = use_pallas and "softmax" in pallas_ops and not p_attn
    p_gelu = use_pallas and "gelu" in pallas_ops
    p_lingelu = use_pallas and "linear_gelu" in pallas_ops
    p_ln = use_pallas and "layernorm" in pallas_ops
    cfg = artifact["config"]
    D, H = cfg["embed_dim"], cfg["num_heads"]
    hd = D // H
    p = cfg["patch_size"]
    # Probability precision, recorded at freeze time. 8 = the precision
    # the reference's deployed TVM graph runs (int8 softmax + pure int8
    # attn@V, /root/reference/TVM_benchmark/models/layers.py:384-386,
    # quantized_vit.py:71-75 — the 3.72× headline was measured with
    # this); 16 = its QAT spec. Both are sim↔deploy bit-exact here
    # because the simulator runs the same out_bits (vit.softmax_bits).
    sm_bits = int(cfg.get("softmax_bits", 16))
    assert sm_bits in (8, 16), sm_bits
    # The fused v1 attention kernel's 2-limb row sums are exact only
    # for <=256 tokens (kernels/attention_fused.py — the bound
    # ops/shiftmax gates on); longer sequences (e.g. 384² inputs,
    # N = 577) must take the XLA path, which switched to the 3-limb
    # exact sum for those rows.
    n_tokens = (cfg["img_size"] // p) ** 2 + 1
    if (p_attn or p_attn2 or p_softmax) and n_tokens > 256:
        import warnings

        warnings.warn(
            f"fused attention/softmax kernels disabled: N={n_tokens} > "
            "256 exceeds the kernels' exact-row-sum bound; using the "
            "XLA path (3-limb exact sum)",
            stacklevel=2,
        )
        p_attn = p_attn2 = p_softmax = False
    if sm_bits == 8:
        # int8 probabilities make @V a single native int8 MXU dot: the
        # base-256 split ("exact") and the f32-HIGH dot collapse to the
        # same exact integer path, and the 16-bit-only perf knobs are
        # inert.
        attn_v_mode = "f32"
        sm_int16 = False
        # the standalone softmax kernel emits the base-256 (hi, lo)
        # split for the 16-bit exact path — moot at 8 bits
        p_softmax = False
    # GELU formulation, recorded at freeze time (a model property —
    # SIM and the engine must run the same mode; see ops/shiftgelu).
    gelu_stable = bool(cfg.get("gelu_stable", False))
    if gelu_stable:
        # the Pallas GELU kernels implement the rowmax spec only
        p_gelu = False
        p_lingelu = False
    # f32 scalar: ratio arithmetic must match the simulator's f32 ops
    qk_scale = np.float32(float(hd) ** -0.5)
    interpret = pallas_interpret
    if qkv_t:
        # transposed-stream attention needs the single-int8-dot @V and
        # the plain XLA chain (the Pallas kernels take (B,·,N,hd)).
        assert sm_bits == 8, "qkv_t requires softmax_bits=8"
        if qkv_t is True:
            qkv_t = "wmajor"
        assert qkv_t in ("wmajor", "bbatch"), qkv_t

    def _block_qkv_t(x, s_x, blk, N):
        """Attention half with a TRANSPOSED qkv stream: the projection
        is computed as W.T-major — ``dot_general(w, y) → (3C, B, N)`` —
        so q/k/v materialize with the token axis minormost, the layout
        the attention dot_generals consume. Bit-identical to the
        canonical path (same elementwise value pairs, exact integer
        dots, order-independent row sums); built to probe whether XLA's
        q/k/v relayout copies (~1.7 ms/iter at batch 128, profiled)
        disappear when the producer emits the consumer's layout."""
        B = x.shape[0]
        C = D
        s1 = blk["s_qact1"]
        y = _layernorm_requant(
            x.astype(jnp.float32), blk["norm1"], s1, 8, *_INT8,
            False, interpret,
        )
        if y.dtype != jnp.int8:
            y = y.astype(jnp.int8)

        qkv = blk["qkv"]
        sa1 = _scale(blk["s_attn_qact1"])
        w = jnp.asarray(qkv["w"])  # (C, 3C)
        if qkv_t == "bbatch":
            # B-batched GEMM: broadcasting the weight over the batch
            # axis lets the dot emit (B, 3C, N) — per-(B, head) the
            # (hd, N) plane the attention dots load, with NO relayout.
            # The barrier keeps the simplifier from collapsing it back
            # to the unbatched GEMM (which re-inserts the copies).
            wb = jax.lax.optimization_barrier(
                jnp.broadcast_to(w[None], (B,) + w.shape)
            )
            acc = jax.lax.dot_general(
                wb, y,
                dimension_numbers=(((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # (B, 3C, N)
            if "b" in qkv:
                acc = acc + jnp.asarray(qkv["b"])[None, :, None]
            ratio = (_scale(qkv["out_scale"]) / sa1)[None, :, None]
            z = rq(acc, ratio, *_INT8, jnp.int8)
            q = z[:, :C].reshape(B, H, hd, N)
            k = z[:, C:2 * C].reshape(B, H, hd, N)
            v = z[:, 2 * C:].reshape(B, H, hd, N)
            bd = ((0, 1), (0, 1))
        else:
            # weight-major GEMM: (3C, B, N). N lands minormost but B
            # stays adjacent to N (both rhs non-contracting), so the
            # dot still relays out per-(B,H) planes — measured loss.
            acc = jax.lax.dot_general(
                w, y,
                dimension_numbers=(((0,), (2,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (3C, B, N)
            if "b" in qkv:
                acc = acc + jnp.asarray(qkv["b"])[:, None, None]
            ratio = (_scale(qkv["out_scale"]) / sa1)[:, None, None]
            z = rq(acc, ratio, *_INT8, jnp.int8)
            q = z[:C].reshape(H, hd, B, N)
            k = z[C:2 * C].reshape(H, hd, B, N)
            v = z[2 * C:].reshape(H, hd, B, N)
            bd = ((0, 2), (0, 2))

        s_attn = (sa1 * sa1) * qk_scale
        ssm = _scale(blk["s_attn_sm_in"])
        s_sm = np.float32(1.0 / 2.0 ** (sm_bits - 1))
        sao = _scale(blk["s_attn_out"])

        cd = 2 if qkv_t == "bbatch" else 1  # the hd axis
        attn = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((cd,), (cd,)), (bd[0], bd[0])),
            preferred_element_type=jnp.int32,
        )  # (B, H, N, N) | (H, B, N, N)
        a8 = _mat(
            rq(attn, s_attn / ssm, *_INT8, jnp.float32), jnp.int8
        ).astype(jnp.float32)
        sm, _ = shiftmax(
            a8, ssm, out_bits=sm_bits, interp=DEPLOY,
            split_normalize=sm_split,
            packed_exp=sm_packed,
            static_p=math.ceil(1.0 / float(blk["s_attn_sm_in"])),
        )
        sm8 = _mat(sm, jnp.int8)
        ctx = jax.lax.dot_general(
            sm8, v,
            dimension_numbers=(((3,), (3,)), ((0, 1), bd[1])),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # (B, H, N, hd) | (H, B, N, hd)
        s_ctx = s_sm * sa1
        ctx = _mat(rq(ctx, s_ctx / sao, *_INT8, jnp.int8), jnp.int8)
        if qkv_t == "bbatch":
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, C)
        else:
            ctx = ctx.transpose(1, 2, 0, 3).reshape(B, N, C)
        return _attn_tail(x, s_x, blk, ctx)

    def _block(x, s_x, blk, N):
        if qkv_t:
            return _block_qkv_t(x, s_x, blk, N)
        B = x.shape[0]
        C = D
        Npad = -(-N // 128) * 128

        # --- attention half ---
        s1 = blk["s_qact1"]
        y = _layernorm_requant(
            x.astype(jnp.float32), blk["norm1"], s1, 8, *_INT8,
            p_ln, interpret,
        )
        if y.dtype != jnp.int8:
            y = y.astype(jnp.int8)

        qkv = blk["qkv"]
        acc = _linear(y, qkv)
        sa1 = _scale(blk["s_attn_qact1"])
        z = rq(acc, _scale(qkv["out_scale"]) / sa1, *_INT8, jnp.int8)

        # Slice q/k/v on the feature axis, keeping the (B, N, H, hd)
        # layout — batch dims in the dot_generals below make head-split
        # transposes unnecessary (profiled: layout copies were ~17% of
        # engine time; a 3-matmul qkv split measured slower than one
        # fused matmul + slices).
        q = z[..., :C].reshape(B, N, H, hd)
        k = z[..., C:2 * C].reshape(B, N, H, hd)
        v = z[..., 2 * C:].reshape(B, N, H, hd)

        # scale arithmetic in the same op order as the simulator:
        # quant_matmul scale product, then the folded 1/sqrt(head_dim)
        # (vit_blocks.py:100-102) — all on-device.
        s_attn = (sa1 * sa1) * qk_scale
        ssm = _scale(blk["s_attn_sm_in"])
        s_sm = np.float32(1.0 / 2.0 ** (sm_bits - 1))
        sao = _scale(blk["s_attn_out"])

        if p_attn:
            # fully-fused attention: the (N, N) matrix never leaves
            # VMEM. Kernel parameters are compile-time host floats —
            # this path trades strict device-division parity for the
            # fused kernel (batch-1 latency regime).
            h_sa1 = float(blk["s_attn_qact1"])
            h_sattn = np.float32(h_sa1 * h_sa1) * qk_scale
            h_ssm = float(blk["s_attn_sm_in"])
            h_sao = float(blk["s_attn_out"])
            s_ctx = s_sm * h_sa1
            G = B * H
            qp = _pad_axis(q.transpose(0, 2, 1, 3), 2, Npad).reshape(G, Npad, hd)
            kp = _pad_axis(k.transpose(0, 2, 1, 3), 2, Npad).reshape(G, Npad, hd)
            vp = _pad_axis(v.transpose(0, 2, 1, 3), 2, Npad).reshape(G, Npad, hd)
            c8 = fused_int8_attention(
                qp, kp, vp,
                r1=float(h_sattn / h_ssm),
                scale=h_ssm,
                r_out=float(s_ctx / h_sao),
                n_valid=N,
                out_bits=sm_bits,
                interpret=interpret,
            )
            ctx = (
                c8.reshape(B, H, Npad, hd)[:, :, :N]
                .transpose(0, 2, 1, 3)
                .reshape(B, N, C)
            )
            return _attn_tail(x, s_x, blk, ctx)

        # same expression the kernel asserts with (p_abs = ⌈1/s⌉ as
        # −⌊−1/s⌋), so gate-pass implies assert-pass even at boundary
        # scales where floor(1/s) < ceil(1/s)
        attn2_ok = (
            N * -math.floor(-1.0 / float(blk["s_attn_sm_in"])) * 2.0**15
            < 2.0**31
        )
        if p_attn2 and not attn2_ok:
            import warnings

            warnings.warn(
                "attention2 scale gate failed for a block "
                f"(s_sm_in={float(blk['s_attn_sm_in']):.3g}); "
                "falling back to the XLA attention path",
                stacklevel=2,
            )
        if p_attn2 and attn2_ok:
            # batched fused attention (kernels/attention_fused_v2): all
            # heads per grid cell, one VPU Shiftmax phase, f32 HIGH @V.
            # Kernel ratios are compile-time host floats (non-strict,
            # like the other Pallas paths). Gated per block on the
            # kernel's int32-row-sum bound; falls through to the XLA
            # path otherwise.
            h_sa1 = float(blk["s_attn_qact1"])
            h_sattn = np.float32(h_sa1 * h_sa1) * qk_scale
            h_ssm = float(blk["s_attn_sm_in"])
            h_sao = float(blk["s_attn_out"])
            s_ctx = np.float32(s_sm * h_sa1)
            Mpad = -(-N // 32) * 32
            qp = _pad_axis(q.transpose(0, 2, 1, 3), 2, Mpad)
            kp = _pad_axis(k.transpose(0, 2, 3, 1), 3, Npad)
            vp = _pad_axis(v.transpose(0, 2, 1, 3), 2, Npad)
            ctx = fused_int8_attention_v2(
                qp, kp, vp,
                r1=float(h_sattn / h_ssm),
                scale=h_ssm,
                r_out=float(s_ctx / h_sao),
                n_valid=N,
                out_bits=sm_bits,
                interpret=interpret,
            )[:, :, :N]  # (B, H, N, hd) int8 — consumed layout-free
            return _attn_tail(x, s_x, blk, ctx)

        if p_softmax and attn_v_mode == "exact":
            # pad the key/value token axis once; padded keys produce
            # zero-probability columns inside the softmax kernel.
            kp = _pad_axis(k, 1, Npad)
            vp = _pad_axis(v, 1, Npad)
            attn = jax.lax.dot_general(
                q, kp,
                dimension_numbers=(((3,), (3,)), ((0, 2), (0, 2))),
                preferred_element_type=jnp.int32,
            )  # (B, H, N, Npad)
            hi8, lo8 = fused_requant_shiftmax(
                attn.reshape(-1, Npad),
                r1=float(
                    np.float32(
                        float(blk["s_attn_qact1"]) ** 2
                    ) * qk_scale / float(blk["s_attn_sm_in"])
                ),
                scale=float(blk["s_attn_sm_in"]),
                n_valid=N,
                out_bits=16,
                interpret=interpret,
            )
            hi8 = hi8.reshape(B, H, N, Npad)
            lo8 = lo8.reshape(B, H, N, Npad)
            vmm = vp
        else:
            attn = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((3,), (3,)), ((0, 2), (0, 2))),
                preferred_element_type=jnp.int32,
            )  # (B, H, N, N)
            # s8 materialization: 30 MB instead of 119 MB f32 per
            # block; the softmax row max then reads the s8 tensor.
            # (Hoisting the max onto the int32 logits — exact, since
            # requant with a positive scalar ratio is monotone — was
            # measured SLOWER: the reduce cannot ride the MXU dot, so
            # it forces the 119 MB int32 accumulator to materialize.)
            a8 = _mat(
                rq(attn, s_attn / ssm, *_INT8, jnp.float32), jnp.int8
            ).astype(jnp.float32)
            # int32-lane softmax when the frozen scale admits it
            # (bit-identical below the f32-exactness bound — see
            # ops/shiftmax.py). Measured ~3% slower than the f32 chain
            # on v5e at batch 128 (VPU int and f32 ops run at the same
            # rate there), so opt-in. 500 vs the true 512 bound leaves
            # margin for host/device floor disagreement in the gate.
            h_p = math.floor(1.0 / float(blk["s_attn_sm_in"]))
            if (
                sm_int_lanes and not sm_split and not sm_packed
                and 1 <= h_p <= 500
                and a8.shape[-1] <= 256  # int twin's row-sum bound
            ):
                sm, _ = shiftmax_int_deploy(a8, ssm, out_bits=sm_bits)
            else:
                # sm_split recomputes the exp instead of materializing
                # it (value-identical; see ops/shiftmax.py
                # split_normalize) — measured slightly slower on v5e at
                # batch 128, kept selectable. sm_packed hands the
                # pass-boundary exp across HBM as a packed u16 instead
                # of f32 (value-identical; ops/shiftmax packed_exp).
                # static_p enables the value-identical guard elisions
                # + int32 row sum.
                sm, _ = shiftmax(
                    a8, ssm, out_bits=sm_bits, interp=DEPLOY,
                    split_normalize=sm_split,
                    packed_exp=sm_packed,
                    static_p=math.ceil(1.0 / float(blk["s_attn_sm_in"])),
                )
            if sm_int16:
                # materialize the softmax tensor as int16 (exact:
                # ≤ 32767) — halves its HBM traffic if XLA keeps the
                # int16 materialization (measured ~neutral on v5e).
                sm = sm.astype(jnp.int16).astype(jnp.float32)
            if attn_v_mode == "exact":
                hi8 = jnp.floor(sm / 256.0).astype(jnp.int8)
                lo8 = (
                    sm - jnp.floor(sm / 256.0) * 256.0 - 128.0
                ).astype(jnp.int8)
            vmm = v

        # attn (B,H,N,K) @ v (B,K,H,hd): contract the token axis with
        # batch dims (0,1)/(0,2) → ctx (B,H,N,hd), no transposed copies.
        dn = (((3,), (1,)), ((0, 1), (0, 2)))
        if sm_bits == 8:
            # int8 probabilities ([0, 127]): @V is ONE native int8 MXU
            # dot with exact int32 accumulation — the reference TVM
            # graph's own deploy precision (quantized_vit.py:71-75).
            # The probability tensor also materializes at 1 byte/elem.
            sm8 = _mat(sm, jnp.int8)
            ctx = jax.lax.dot_general(
                sm8, vmm, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        elif attn_v_mode == "exact":
            # base-256 split → two int8 MXU matmuls + rank-1 correction,
            # exact in int32.
            ctx_hi = jax.lax.dot_general(
                hi8, vmm, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            ctx_lo = jax.lax.dot_general(
                lo8, vmm, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            v_sum = jnp.sum(vmm.astype(jnp.int32), axis=1)  # (B, H, hd)
            ctx = (
                256 * ctx_hi + ctx_lo + 128 * v_sum[:, :, None]
            ).astype(jnp.float32)
        else:
            # HIGH (3-pass bf16) is exact for 15-bit × 7-bit operands and
            # ~2× cheaper than HIGHEST (verified bit-equal on v5e).
            ctx = jax.lax.dot_general(
                sm, vmm.astype(jnp.float32), dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGH,
            )
        s_ctx = s_sm * sa1
        # barrier pins the int8 conversion before the (H, N) transpose
        # copy the proj matmul needs (otherwise XLA copies in f32).
        ctx = _mat(rq(ctx, s_ctx / sao, *_INT8, jnp.int8), jnp.int8)
        if proj_4d:
            # hand the (B, H, N, hd) context to the proj dot directly
            # (reshaped-weight contraction in _attn_tail) — no explicit
            # head-merge copy; XLA lays out the operand itself.
            return _attn_tail(x, s_x, blk, ctx)
        # explicit head-merge AFTER the s8 barrier: the (H, N) transpose
        # copy then moves int8 bytes, not the f32 carrier XLA's layout
        # assignment would otherwise copy before converting.
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, C)
        return _attn_tail(x, s_x, blk, ctx)

    def _attn_tail(x, s_x, blk, ctx):
        B, N, C = x.shape
        proj = blk["proj"]
        if ctx.ndim == 4:
            # (B, H, N, hd) @ w (H·hd, C) reshaped (H, hd, C): contract
            # (1, 3)↔(0, 1) → (B, N, C) with no layout copy. Row index of
            # w is h·hd + d, matching the simulator's head-merge reshape.
            w = jnp.asarray(proj["w"]).reshape(H, hd, C)
            acc = jax.lax.dot_general(
                ctx, w,
                dimension_numbers=(((1, 3), (0, 1)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if "b" in proj:
                acc = acc + jnp.asarray(proj["b"])
        else:
            acc = _linear(ctx, proj)
        sap = _scale(blk["s_attn_proj"])
        ctx = rq(acc, _scale(proj["out_scale"]) / sap, *_INT16, jnp.float32)
        if res_split:
            ctx = _mat(ctx, jnp.int16).astype(jnp.float32)

        # residual merge (dual-scale 16-bit, vit_quant.py:135); s16
        # materialization halves the residual stream's HBM traffic.
        sr1 = _scale(blk["s_res1"])
        x = _mat(
            jnp.clip(
                jnp.round(ctx * (sap / sr1))
                + jnp.round(x.astype(jnp.float32) * (s_x / sr1)),
                *_INT16,
            ),
            jnp.int16,
        ).astype(jnp.float32)
        s_x = sr1

        # --- MLP half ---
        s3 = blk["s_qact3"]
        y = _layernorm_requant(
            x, blk["norm2"], s3, 8, *_INT8, p_ln, interpret
        )
        if y.dtype != jnp.int8:
            y = y.astype(jnp.int8)

        fc1 = blk["fc1"]
        if p_lingelu:
            # fc1 matmul with the whole requant->ShiftGELU->requant
            # chain as its epilogue: the (B*N, 4C) int32 accumulator and
            # the int8 GELU input both live and die in VMEM. Kernel
            # parameters are compile-time host floats (non-strict like
            # the other Pallas paths).
            Chh = jnp.asarray(fc1["w"]).shape[1]
            h_sg_in = float(blk["s_gelu_in"])
            h_s_g = np.float32(h_sg_in * np.float32(1.0 / 2.0**7))
            g8 = fused_linear_shiftgelu(
                y.reshape(-1, C),
                jnp.asarray(fc1["w"]),
                jnp.asarray(fc1["b"]),
                jnp.asarray(
                    (fc1["out_scale"] / np.float32(h_sg_in)).astype(
                        np.float32
                    )
                ),
                s_in=h_sg_in,
                r2=float(h_s_g / float(blk["s_gelu_out"])),
                out_bits=8,
                interpret=interpret,
            ).reshape(B, N, Chh)
            fc2 = blk["fc2"]
            acc = _linear(g8, fc2)
            smo = _scale(blk["s_mlp_out"])
            m = rq(
                acc, _scale(fc2["out_scale"]) / smo, *_INT16, jnp.float32
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

        acc = _linear(y, fc1)
        sg_in = _scale(blk["s_gelu_in"])
        sg_out = _scale(blk["s_gelu_out"])
        Ch = acc.shape[-1]
        # ShiftGELU output scale, out_bits=8 (f32 arithmetic as in sim)
        s_g = sg_in * np.float32(1.0 / 2.0**7)

        if p_gelu and Ch % 128 == 0:
            h_sg_in = float(blk["s_gelu_in"])
            h_s_g = np.float32(h_sg_in * np.float32(1.0 / 2.0**7))
            g8 = fused_requant_shiftgelu(
                acc.reshape(-1, Ch),
                jnp.asarray(
                    (fc1["out_scale"] / np.float32(h_sg_in)).astype(np.float32)
                ),
                s_in=h_sg_in,
                r2=float(h_s_g / float(blk["s_gelu_out"])),
                out_bits=8,
                interpret=interpret,
            ).reshape(B, N, Ch)
        else:
            # s8 materialization: 39 MB instead of 155 MB f32 — the
            # gelu chain re-reads its input twice (sum pass + final).
            gq = _mat(
                rq(acc, _scale(fc1["out_scale"]) / sg_in, *_INT8, jnp.float32),
                jnp.int8,
            ).astype(jnp.float32)
            static_p = math.ceil(
                1.0 / (1.702 * float(blk["s_gelu_in"]))
            )
            if (
                gelu_int_lanes
                and gelu_stable
                and gelu_int_lanes_valid(static_p)
            ):
                # int32-lane twin: native shifts/adds for the per-
                # element head, PROVABLY bit-identical to the f32
                # chain below (ops/shiftgelu, tests/test_ops.py
                # TestShiftgeluStableIntDeploy)
                g, _ = shiftgelu_stable_int_deploy(
                    gq, sg_in, out_bits=8, static_p=static_p
                )
            else:
                g, _ = shiftgelu(
                    gq, sg_in, out_bits=8, interp=DEPLOY,
                    static_p=static_p,
                    stable=gelu_stable,
                )
            g8 = rq(g, s_g / sg_out, *_INT8, jnp.int8)

        fc2 = blk["fc2"]
        acc = _linear(g8, fc2)
        smo = _scale(blk["s_mlp_out"])
        m = rq(acc, _scale(fc2["out_scale"]) / smo, *_INT16, jnp.float32)
        if res_split:
            # cut the dot+requant fusion free of the residual chain: the
            # fused (dot, requant, residual, s16-store) kOutput fusion
            # measures ~2x the bare dot+requant rate (profiled).
            m = _mat(m, jnp.int16).astype(jnp.float32)

        sr2 = _scale(blk["s_res2"])
        x = _mat(
            jnp.clip(
                jnp.round(m * (smo / sr2)) + jnp.round(x * (s_x / sr2)),
                *_INT16,
            ),
            jnp.int16,
        ).astype(jnp.float32)
        return x, sr2

    def infer(images):
        B = images.shape[0]
        s_in = artifact["input_scale"]
        x = jnp.clip(
            jnp.round(images / _scale(s_in)), *_INT8
        ).astype(jnp.int8)

        # Patch embed: space-to-depth + int8 matmul.
        gh = cfg["img_size"] // p
        x = x.reshape(B, gh, p, gh, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gh, p * p * 3)
        pe = artifact["patch_embed"]
        acc = _linear(x, pe)
        s_embed = _scale(artifact["embed_scale"])
        x = rq(acc, _scale(pe["out_scale"]) / s_embed, *_INT16, jnp.int32)

        # cls concat at the shared scale; pos-embed dual-scale merge
        # (vit_quant.py:259-265).
        cls = jnp.broadcast_to(
            jnp.asarray(artifact["cls_q"], jnp.int32), (B, 1, D)
        )
        x = jnp.concatenate([cls, x], axis=1)
        s_tok = _scale(artifact["tokens_scale"])
        pos = jnp.round(
            jnp.asarray(artifact["pos_q"])
            * (_scale(artifact["pos_scale"]) / s_tok)
        )
        x = _mat(
            jnp.clip(
                jnp.round(x.astype(jnp.float32) * (s_embed / s_tok)) + pos,
                *_INT16,
            ),
            jnp.int16,
        ).astype(jnp.float32)
        s_x = s_tok
        N = x.shape[1]

        for blk in artifact["blocks"]:
            x, s_x = _block(x, s_x, blk, N)

        # Final norm → CLS → head (the only float op is the last scale).
        s_head = artifact["head_in_scale"]
        y = _layernorm_requant(
            x, artifact["norm"], s_head, 8, *_INT8, p_ln, interpret
        )
        if y.dtype != jnp.int8:
            y = y.astype(jnp.int8)
        y = y[:, 0]
        head = artifact["head"]
        logits = _linear(y, head)
        return logits.astype(jnp.float32) * head["out_scale"]

    return infer
