"""Quantized layer zoo (flax.linen modules over QTensor).

TPU-native re-design of the reference quantized layers
(/root/reference/models/quantization_utils/quant_modules.py):

* ``QuantLinear``   — per-out-channel int8 weights recomputed from the live
  kernel every step (quant_modules.py:12-97). The matmul runs on integer
  values so the MXU int8 path can serve it verbatim in deploy mode.
* ``QuantAct``      — EMA range tracker + requantizer + the scale-unifier
  for residual adds (quant_modules.py:100-206). EMA state lives in the
  ``quant_stats`` flax collection — the functional analogue of the
  reference's registered buffers + ``fix()``/``unfix()`` toggling
  (models/model_utils.py:5-40): pass ``update_stats=True`` to "unfix".
* ``quant_matmul``  — activation·activation integer matmul
  (quant_modules.py:209-228).
* ``QuantPatchEmbed`` — the patch-embedding conv re-expressed as
  space-to-depth + one large matmul. A stride=kernel conv is exactly a
  reshape followed by a dense layer; on TPU this keeps the FLOPs on the
  MXU as one big matmul instead of a small-window convolution
  (reference uses QuantConv2d, quant_modules.py:231-330).
* ``QuantConv2d``   — general NHWC quantized conv for API parity.
* ``IntLayerNorm`` / ``IntGELU`` / ``IntSoftmax`` — module wrappers over
  the integer kernels in ``ivit_tpu.ops``.

Every module maps QTensor → QTensor; scales are carried inside the
pytree, never as loose tuples.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.qtensor import QTensor
from ..core.quantizers import symmetric_scale, weight_scale
from ..core.ste import quantize
from ..ops import SIM, Interp, int_layernorm, requantize, shiftgelu, shiftmax


class QuantAct(nn.Module):
    """Activation (re)quantizer with EMA range tracking.

    ``x`` may be a raw float array (first-layer input quantization,
    quant_modules.py:194-196) or a QTensor (dyadic requantization,
    quant_modules.py:198-202). ``identity`` merges a residual branch held
    at a different scale — the reference's dual-scale residual add.
    """

    bits: int = 8
    momentum: float = 0.95
    interp: Interp = SIM

    @nn.compact
    def __call__(
        self,
        x,
        identity: Optional[QTensor] = None,
        update_stats: bool = False,
    ) -> QTensor:
        min_v = self.variable(
            "quant_stats", "min_val", lambda: jnp.zeros((), jnp.float32)
        )
        max_v = self.variable(
            "quant_stats", "max_val", lambda: jnp.zeros((), jnp.float32)
        )

        is_qtensor = isinstance(x, QTensor)
        real = x.dequantize() if is_qtensor else jnp.asarray(x, jnp.float32)
        if identity is not None:
            real = real + identity.dequantize()

        if update_stats:
            real_ng = jax.lax.stop_gradient(real)
            cur_min = jnp.min(real_ng)
            cur_max = jnp.max(real_ng)
            # First batch assigns directly; afterwards EMA with momentum
            # (reference's min==max sentinel, quant_modules.py:177-187).
            first = min_v.value == max_v.value
            m = self.momentum
            min_v.value = jnp.where(first, cur_min, m * min_v.value + (1 - m) * cur_min)
            max_v.value = jnp.where(first, cur_max, m * max_v.value + (1 - m) * cur_max)

        scale = symmetric_scale(min_v.value, max_v.value, self.bits)

        if not is_qtensor:
            q = quantize(real, scale, self.bits)
        else:
            q = requantize(
                x.q,
                x.scale,
                scale,
                self.bits,
                identity_q=None if identity is None else identity.q,
                identity_scale=None if identity is None else identity.scale,
                interp=self.interp,
            )
        return QTensor(q=q, scale=scale, bits=self.bits)


class QuantLinear(nn.Module):
    """Dense layer with per-out-channel symmetric int8 weights.

    Weight scales are recomputed from the live kernel every call
    (quant_modules.py:68-80); the int32 bias is quantized at
    ``w_scale · s_in`` (quant_modules.py:85-89). Output is an int32-valued
    QTensor at the per-channel scale ``w_scale · s_in``
    (quant_modules.py:96-97). The caller (a QuantAct) requantizes.
    """

    features: int
    use_bias: bool = True
    weight_bits: int = 8
    bias_bits: int = 32
    interp: Interp = SIM

    @nn.compact
    def __call__(self, x: QTensor) -> QTensor:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(stddev=0.02),
            (in_features, self.features),
            jnp.float32,
        )
        # Per-out-channel scale: kernel is (in, out); reduce over axis 0.
        w_scale = weight_scale(kernel.T, self.weight_bits)  # (out,)
        w_int = quantize(kernel, w_scale, self.weight_bits)  # broadcast on out

        out_scale = w_scale * jax.lax.stop_gradient(x.scale)  # (out,)
        # Integer-exact forward: a true int8 MXU dot with the int32 bias
        # folded into the accumulator — bit-identical to the deploy
        # engine at every model size (f32 accumulation would silently
        # round above 2^24, e.g. fc2's K=1536). Gradients remain
        # full-precision f32 matmuls (custom_vjp).
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            b_int = quantize(bias, out_scale, self.bias_bits)
            y = exact_int8_dot_bias(x.q, w_int, b_int)
        else:
            y = exact_int8_dot(x.q, w_int)
        return QTensor(q=y, scale=out_scale, bits=32)


# Opt-in fast QAT matmuls: forward stays exact for integer operands at
# the cheaper precision tiers, but backward inherits them too — i.e.
# bf16-rounded gradients (standard TPU training practice, but a numerics
# change vs the reference's fp32 training). Default off until accuracy
# is validated on real data.
SIM_FAST_MATMUL = False


# ---------------------------------------------------------------------------
# Integer-exact simulated matmuls.
#
# f32 accumulation rounds once partial sums exceed 2^24 (fc2's K=1536 and
# the softmax@V contraction do), so a float-carrier simulator silently
# diverges from the int32-exact deploy engine at full model size — the
# same drift class the reference has between its torch-QAT and TVM paths.
# These custom_vjp dots run the FORWARD as true int8/int32 MXU dots
# (bit-identical to deployment, and faster than HIGHEST f32) while the
# BACKWARD keeps full-precision f32 matmuls, so training gradients are
# unchanged.
# ---------------------------------------------------------------------------


def _leading_axes(x):
    return tuple(range(x.ndim - 1))


def _bwd_precision():
    # SIM_FAST_MATMUL trades full-precision f32 gradients for one-pass
    # bf16 (forward is integer-exact either way).
    return (
        jax.lax.Precision.DEFAULT
        if SIM_FAST_MATMUL
        else jax.lax.Precision.HIGHEST
    )


@jax.custom_vjp
def exact_int8_dot_bias(x, w, b):
    """x: (..., K) int8-valued f32 carrier; w: (K, N) int8-valued;
    b: (N,) int32-valued. Forward = true int8 MXU dot with the bias added
    in int32 — bit-identical to the deploy engine's accumulator."""
    y = jax.lax.dot_general(
        x.astype(jnp.int8),
        w.astype(jnp.int8),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) + b.astype(jnp.int32)
    return y.astype(jnp.float32)


def _eidb_fwd(x, w, b):
    return exact_int8_dot_bias(x, w, b), (x, w)


def _eidb_bwd(res, g):
    x, w = res
    p = _bwd_precision()
    dx = jnp.matmul(g, w.T, precision=p)
    dw = jax.lax.dot_general(
        x, g,
        dimension_numbers=((_leading_axes(x), _leading_axes(g)), ((), ())),
        precision=p,
    )
    db = jnp.sum(g, axis=_leading_axes(g))
    return dx, dw, db


exact_int8_dot_bias.defvjp(_eidb_fwd, _eidb_bwd)


@jax.custom_vjp
def exact_int8_dot(x, w):
    """Bias-free variant of :func:`exact_int8_dot_bias`."""
    y = jax.lax.dot_general(
        x.astype(jnp.int8),
        w.astype(jnp.int8),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32)


def _exact_int8_dot_fwd(x, w):
    return exact_int8_dot(x, w), (x, w)


def _exact_int8_dot_bwd(res, g):
    dx, dw, _ = _eidb_bwd(res, g)
    return dx, dw


exact_int8_dot.defvjp(_exact_int8_dot_fwd, _exact_int8_dot_bwd)


def _swap_last2(a):
    perm = list(range(a.ndim))
    perm[-1], perm[-2] = perm[-2], perm[-1]
    return a.transpose(perm)


def _int_mm(a, b):
    """Batched last-two-dims integer matmul; both int8-valued."""
    dims = (
        ((a.ndim - 1,), (b.ndim - 2,)),
        (tuple(range(a.ndim - 2)), tuple(range(b.ndim - 2))),
    )
    return jax.lax.dot_general(
        a.astype(jnp.int8), b.astype(jnp.int8),
        dimension_numbers=dims, preferred_element_type=jnp.int32,
    )


@jax.custom_vjp
def exact_int_matmul_16x8(a, b):
    """Batched matmul of a 16-bit-valued carrier with an 8-bit-valued
    carrier: base-256 split into two int8 MXU dots + rank-1 correction —
    exact in int32 for |a| < 2^15."""
    hi = jnp.floor(a / 256.0)
    lo = a - hi * 256.0 - 128.0
    c = 256 * _int_mm(hi, b) + _int_mm(lo, b)
    corr = 128 * jnp.sum(b.astype(jnp.int32), axis=-2, keepdims=True)
    return (c + corr).astype(jnp.float32)


def _eim_fwd(a, b):
    return exact_int_matmul_16x8(a, b), (a, b)


def _eim_bwd(res, g):
    a, b = res
    p = _bwd_precision()
    da = jnp.matmul(g, _swap_last2(b), precision=p)
    db = jnp.matmul(_swap_last2(a), g, precision=p)
    return da, db


exact_int_matmul_16x8.defvjp(_eim_fwd, _eim_bwd)


@jax.custom_vjp
def exact_int_matmul_8x8(a, b):
    """Batched matmul of two 8-bit-valued carriers as a true int8 dot."""
    return _int_mm(a, b).astype(jnp.float32)


def _eim8_fwd(a, b):
    return exact_int_matmul_8x8(a, b), (a, b)


exact_int_matmul_8x8.defvjp(_eim8_fwd, _eim_bwd)


def quant_matmul(a: QTensor, b: QTensor) -> QTensor:
    """Integer activation·activation matmul over the last two axes.

    Output scale is the product of the operand scales
    (quant_modules.py:223-228). Both operands are integer-valued, so the
    product is integer-valued at ``s_a · s_b``.
    """
    m = max(a.bits, b.bits)
    if m <= 8:
        y = exact_int_matmul_8x8(a.q, b.q)
    elif a.bits <= 16 and b.bits <= 8:
        y = exact_int_matmul_16x8(a.q, b.q)
    else:
        y = jnp.matmul(
            a.q, b.q,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return QTensor(q=y, scale=a.scale * b.scale, bits=32)


class QuantPatchEmbed(nn.Module):
    """Patch embedding as space-to-depth + quantized matmul.

    A stride=patch, kernel=patch convolution touches each input pixel
    exactly once, so it is algebraically a reshape followed by a dense
    projection. On TPU this maps the whole patch embedding onto one MXU
    matmul of shape (B·N, p·p·C)×(p·p·C, D) instead of a small-window
    conv. Functionally equivalent to the reference PatchEmbed
    (/root/reference/models/layers_quant.py:156-197 + QuantConv2d,
    quant_modules.py:231-330).

    Input is NHWC. The kernel is stored as ``(p*p*C, D)`` with row index
    ordered (ph, pw, c) — the importer maps torch's (D, C, ph, pw) conv
    weights onto this layout.
    """

    patch_size: int = 16
    features: int = 768
    weight_bits: int = 8
    bias_bits: int = 32
    interp: Interp = SIM

    @nn.compact
    def __call__(self, x: QTensor) -> QTensor:
        B, H, W, C = x.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        q = x.q.reshape(B, gh, p, gw, p, C)
        q = q.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)

        proj = QuantLinear(
            features=self.features,
            weight_bits=self.weight_bits,
            bias_bits=self.bias_bits,
            interp=self.interp,
            name="proj",
        )
        return proj(QTensor(q=q, scale=x.scale, bits=x.bits))


class QuantConv2d(nn.Module):
    """General quantized NHWC convolution (per-out-channel int8 weights).

    API-parity analogue of the reference QuantConv2d
    (quant_modules.py:231-330); the models use QuantPatchEmbed instead
    because their only conv is stride=kernel.
    """

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: str = "VALID"
    use_bias: bool = True
    weight_bits: int = 8
    bias_bits: int = 32
    interp: Interp = SIM

    @nn.compact
    def __call__(self, x: QTensor) -> QTensor:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(stddev=0.02),
            (kh, kw, in_ch, self.features),
            jnp.float32,
        )
        # Per-out-channel scale: move out axis first for the reduction.
        w_scale = weight_scale(
            kernel.transpose(3, 0, 1, 2), self.weight_bits
        )  # (out,)
        w_int = quantize(kernel, w_scale, self.weight_bits)

        out_scale = w_scale * jax.lax.stop_gradient(x.scale)
        y = jax.lax.conv_general_dilated(
            x.q,
            w_int,
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + quantize(bias, out_scale, self.bias_bits)
        return QTensor(q=y, scale=out_scale, bits=32)


class IntLayerNorm(nn.Module):
    """I-LayerNorm module: integer mean/var + Newton integer sqrt.

    γ folds into the (per-channel, differentiable) output scale, β folds
    into an integer bias (quant_modules.py:333-386).
    """

    features: int
    interp: Interp = SIM

    @nn.compact
    def __call__(self, x: QTensor) -> QTensor:
        gamma = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        beta = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        q, s = int_layernorm(x.q, gamma, beta, interp=self.interp)
        return QTensor(q=q, scale=s, bits=32)


class IntGELU(nn.Module):
    """ShiftGELU module (quant_modules.py:389-445). ``stable`` selects
    the elementwise-stable formulation (see ops/shiftgelu.shiftgelu) —
    a model property recorded at freeze time."""

    out_bits: int = 8
    stable: bool = False
    interp: Interp = SIM

    def __call__(self, x: QTensor) -> QTensor:
        q, s = shiftgelu(x.q, x.scale, out_bits=self.out_bits,
                         interp=self.interp, stable=self.stable)
        return QTensor(q=q, scale=s, bits=32)


class IntSoftmax(nn.Module):
    """Shiftmax module (quant_modules.py:448-497).

    ViT instantiates 16-bit output (vit_quant.py:54), Swin 8-bit
    (swin_quant.py:108). ``mask`` is an integer-domain additive mask for
    Swin's shifted windows.
    """

    out_bits: int = 16
    interp: Interp = SIM

    def __call__(self, x: QTensor, mask: Optional[jax.Array] = None) -> QTensor:
        q, s = shiftmax(
            x.q, x.scale, out_bits=self.out_bits, interp=self.interp, mask=mask
        )
        return QTensor(q=q, scale=s, bits=self.out_bits)
