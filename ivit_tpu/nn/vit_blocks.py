"""Transformer building blocks: Mlp, Attention, Block.

Wiring mirrors the reference's scale-propagation dataflow exactly
(/root/reference/models/vit_quant.py:23-143 and
/root/reference/models/layers_quant.py:116-153): every residual add is a
dual-scale merge inside a 16-bit QuantAct, never a raw tensor add.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.qtensor import QTensor
from ..ops import SIM, Interp
from .quant import IntGELU, IntLayerNorm, IntSoftmax, QuantAct, QuantLinear, quant_matmul


def quant_dropout(module: nn.Module, x: QTensor, rate: float) -> QTensor:
    """Dropout on a QTensor without breaking carrier integrality.

    ``nn.Dropout`` scales survivors by 1/keep, which would make the
    integer carrier non-integral (up to 127/keep) and wrap in the exact
    int8/16×8 MXU dots downstream. Instead the 0/1 mask hits the carrier
    and the 1/keep rescale folds into the scale — same expected value as
    the reference's float dropout (layers_quant.py:148,151;
    vit_quant.py:77), integer carrier preserved.
    """
    keep = 1.0 - rate
    mask = jax.random.bernoulli(module.make_rng("dropout"), keep, x.q.shape)
    return QTensor(
        q=x.q * mask.astype(x.q.dtype),
        scale=x.scale * jnp.float32(1.0 / keep),
        bits=x.bits,
    )


def drop_path(
    x: QTensor,
    rate: float,
    deterministic: bool,
    rng: Optional[jax.Array],
) -> QTensor:
    """Stochastic depth on the integer carrier (train-only float op).

    The reference applies DropPath to the real-valued branch output before
    the residual requant (/root/reference/models/layers_quant.py:84-113);
    the subsequent requantization round restores integrality, so scaling
    the carrier by 1/keep is safe in simulation mode.
    """
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(jnp.float32)
    return x.replace(q=x.q * mask / keep)


class Mlp(nn.Module):
    """fc1 → qact → ShiftGELU → qact → fc2 → qact(16b)
    (/root/reference/models/layers_quant.py:116-153)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    gelu_stable: bool = False
    interp: Interp = SIM

    @nn.compact
    def __call__(self, x: QTensor, train: bool = False) -> QTensor:
        it = self.interp
        x = QuantLinear(self.hidden_features, interp=it, name="fc1")(x)
        x = QuantAct(8, interp=it, name="qact_gelu")(x, update_stats=train)
        x = IntGELU(out_bits=8, stable=self.gelu_stable, interp=it,
                    name="act")(x)
        x = QuantAct(8, interp=it, name="qact1")(x, update_stats=train)
        if train and self.drop > 0.0:
            x = quant_dropout(self, x, self.drop)
        x = QuantLinear(self.out_features, interp=it, name="fc2")(x)
        x = QuantAct(16, interp=it, name="qact2")(x, update_stats=train)
        # second drop site, mirroring the reference's
        # fc2 → qact2 → drop (layers_quant.py:151-153)
        if train and self.drop > 0.0:
            x = quant_dropout(self, x, self.drop)
        return x


class Attention(nn.Module):
    """Quantized multi-head self-attention
    (/root/reference/models/vit_quant.py:23-88).

    qkv → qact → head split → int matmul(q,kᵀ) with the 1/√d factor folded
    into the *scale* (the integer values never change, vit_quant.py:72-73)
    → qact → Shiftmax(16) → int matmul(attn,v) → qact → proj → qact(16b).

    ``softmax_bits``: probability precision. 16 is the reference's QAT
    spec (vit_quant.py:54); 8 is the precision its deployed TVM graph
    actually runs — probabilities cast to int8 and attn@V as a pure
    int8 matmul (/root/reference/TVM_benchmark/models/layers.py:384-386,
    quantized_vit.py:71-75) — which the paper's 3.72× was measured
    with. At 8 the sim's attn@V drops to the exact 8×8 int dot
    automatically (quant_matmul dispatch), matching the deploy engine's
    single int8 MXU dot bit-for-bit.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    softmax_bits: int = 16
    interp: Interp = SIM

    @nn.compact
    def __call__(self, x: QTensor, train: bool = False) -> QTensor:
        it = self.interp
        B, N, C = x.shape
        H = self.num_heads
        D = C // H

        qkv = QuantLinear(3 * C, use_bias=self.qkv_bias, interp=it, name="qkv")(x)
        qkv = QuantAct(8, interp=it, name="qact1")(qkv, update_stats=train)

        # (B, N, 3C) -> 3 × (B, H, N, D)
        parts = qkv.q.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q = QTensor(q=parts[0], scale=qkv.scale, bits=8)
        k = QTensor(q=parts[1], scale=qkv.scale, bits=8)
        v = QTensor(q=parts[2], scale=qkv.scale, bits=8)

        attn = quant_matmul(q, k.transpose(0, 1, 3, 2))
        # Fold 1/sqrt(head_dim) into the scale only.
        attn = attn.replace(scale=attn.scale * (D ** -0.5))
        attn = QuantAct(8, interp=it, name="qact_attn1")(attn, update_stats=train)
        attn = IntSoftmax(
            out_bits=self.softmax_bits, interp=it, name="int_softmax"
        )(attn)
        if train and self.attn_drop > 0.0:
            attn = quant_dropout(self, attn, self.attn_drop)

        out = quant_matmul(attn, v)  # (B, H, N, D) @ (B, H, N, D)
        out = out.replace(q=out.q.transpose(0, 2, 1, 3).reshape(B, N, C))

        out = QuantAct(8, interp=it, name="qact2")(out, update_stats=train)
        out = QuantLinear(C, interp=it, name="proj")(out)
        out = QuantAct(16, interp=it, name="qact3")(out, update_stats=train)
        if train and self.proj_drop > 0.0:
            out = quant_dropout(self, out, self.proj_drop)
        return out


class Block(nn.Module):
    """Pre-norm residual transformer block
    (/root/reference/models/vit_quant.py:91-143).

    Residual adds happen *inside* the 16-bit QuantActs (qact2/qact4) as
    dual-scale dyadic merges.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    softmax_bits: int = 16
    gelu_stable: bool = False
    interp: Interp = SIM

    @nn.compact
    def __call__(self, x1: QTensor, train: bool = False) -> QTensor:
        it = self.interp

        x = IntLayerNorm(self.dim, interp=it, name="norm1")(x1)
        x = QuantAct(8, interp=it, name="qact1")(x, update_stats=train)
        x = Attention(
            self.dim,
            self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            softmax_bits=self.softmax_bits,
            interp=it,
            name="attn",
        )(x, train=train)
        if train and self.drop_path_rate > 0.0:
            x = drop_path(
                x, self.drop_path_rate, False, self.make_rng("dropout")
            )
        x2 = QuantAct(16, interp=it, name="qact2")(
            x, identity=x1, update_stats=train
        )

        y = IntLayerNorm(self.dim, interp=it, name="norm2")(x2)
        y = QuantAct(8, interp=it, name="qact3")(y, update_stats=train)
        y = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop=self.drop,
            gelu_stable=self.gelu_stable,
            interp=it,
            name="mlp",
        )(y, train=train)
        if train and self.drop_path_rate > 0.0:
            y = drop_path(
                y, self.drop_path_rate, False, self.make_rng("dropout")
            )
        return QuantAct(16, interp=it, name="qact4")(
            y, identity=x2, update_stats=train
        )
