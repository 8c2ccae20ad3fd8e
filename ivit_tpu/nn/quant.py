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
        # On TPU the default f32 matmul decomposes to bf16 passes, which
        # cannot represent >8-bit integer carriers exactly; pick the
        # cheapest exact tier (deploy mode replaces this with the native
        # int8 MXU path).
        y = jnp.dot(
            x.q,
            w_int,
            preferred_element_type=jnp.float32,
            precision=_int_precision(x.bits, self.weight_bits),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + quantize(bias, out_scale, self.bias_bits)
        return QTensor(q=y, scale=out_scale, bits=32)


# Opt-in fast QAT matmuls: forward stays exact for integer operands at
# the cheaper precision tiers, but backward inherits them too — i.e.
# bf16-rounded gradients (standard TPU training practice, but a numerics
# change vs the reference's fp32 training). Default off until accuracy
# is validated on real data.
SIM_FAST_MATMUL = False


def _int_precision(*bits):
    """Cheapest TPU matmul precision that is exact for integer operands
    of the given bitwidths: ≤8-bit values are exact in one bf16 pass
    (DEFAULT); ≤16-bit need the 3-pass split (HIGH); wider fall back to
    HIGHEST. Accumulation is f32 in all cases, identical across tiers."""
    if not SIM_FAST_MATMUL:
        return jax.lax.Precision.HIGHEST
    m = max(bits)
    if m <= 8:
        return jax.lax.Precision.DEFAULT
    if m <= 16:
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.HIGHEST


def quant_matmul(a: QTensor, b: QTensor) -> QTensor:
    """Integer activation·activation matmul over the last two axes.

    Output scale is the product of the operand scales
    (quant_modules.py:223-228). Both operands are integer-valued, so the
    product is integer-valued at ``s_a · s_b``.
    """
    y = jnp.matmul(
        a.q,
        b.q,
        preferred_element_type=jnp.float32,
        precision=_int_precision(a.bits, b.bits),
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
    """ShiftGELU module (quant_modules.py:389-445)."""

    out_bits: int = 8
    interp: Interp = SIM

    def __call__(self, x: QTensor) -> QTensor:
        q, s = shiftgelu(x.q, x.scale, out_bits=self.out_bits, interp=self.interp)
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
