"""Integer-only Swin Transformer.

TPU-native rebuild of /root/reference/models/swin_quant.py: hierarchical
stages with shifted-window attention, quantized relative-position bias
(dual-scale add, swin_quant.py:142-149), SW-MSA additive mask applied in
the integer domain before Shiftmax (swin_quant.py:151-155), patch
merging, and token-mean pooling. Window partitioning is a static reshape
(no dynamic shapes — every stage's resolution is compile-time constant).
"""

from __future__ import annotations

import functools

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.qtensor import QTensor
from ..nn.quant import (
    IntLayerNorm,
    IntSoftmax,
    QuantAct,
    QuantLinear,
    QuantPatchEmbed,
    exact_int_matmul_8x8,
)
from ..nn.vit_blocks import Mlp, drop_path, quant_dropout
from ..ops import SIM, Interp


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) → (B·nW, ws·ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(x: jax.Array, ws: int, H: int, W: int) -> jax.Array:
    """(B·nW, ws·ws, C) → (B, H, W, C)."""
    C = x.shape[-1]
    B = x.shape[0] // ((H // ws) * (W // ws))
    x = x.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


@functools.lru_cache(maxsize=None)
def relative_position_index(ws: int) -> np.ndarray:
    """Static (ws², ws²) index into the (2ws−1)² bias table
    (swin_quant.py:79-92 semantics, computed host-side with numpy).
    Cached: recomputed per trace otherwise (round-1 review nit)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def sw_attn_mask(H: int, W: int, ws: int, shift: int) -> Optional[np.ndarray]:
    """Static SW-MSA mask (nW, ws², ws²) of {0, −100}
    (swin_quant.py:225-249 semantics). Cached per geometry."""
    if shift == 0:
        return None
    img = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    win = img.reshape(1, H // ws, ws, W // ws, ws, 1)
    win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA / SW-MSA with quantized relative-position bias
    (swin_quant.py:53-169)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    interp: Interp = SIM

    @nn.compact
    def __call__(
        self,
        x: QTensor,
        mask: Optional[np.ndarray] = None,
        train: bool = False,
    ) -> QTensor:
        it = self.interp
        Bw, N, C = x.shape
        H = self.num_heads
        D = C // H

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
            jnp.float32,
        )

        qkv = QuantLinear(3 * C, use_bias=self.qkv_bias, interp=it, name="qkv")(x)
        qkv = QuantAct(8, interp=it, name="qact1")(qkv, update_stats=train)
        parts = qkv.q.reshape(Bw, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        v_scale = qkv.scale

        attn_q = exact_int_matmul_8x8(parts[0], parts[1].transpose(0, 1, 3, 2))
        attn = QTensor(
            q=attn_q, scale=qkv.scale * qkv.scale * (D**-0.5), bits=32
        )
        attn = QuantAct(8, interp=it, name="qact_attn1")(attn, update_stats=train)

        # Quantized relative-position bias, merged dual-scale
        # (swin_quant.py:142-149).
        table_q = QuantAct(8, interp=it, name="qact_table")(
            table, update_stats=train
        )
        idx = relative_position_index(self.window_size).reshape(-1)
        bias_q = table_q.q[idx].reshape(N, N, H).transpose(2, 0, 1)
        bias = QTensor(
            q=jnp.broadcast_to(bias_q[None], attn.shape),
            scale=table_q.scale,
            bits=8,
        )
        attn = QuantAct(8, interp=it, name="qact2")(
            attn, identity=bias, update_stats=train
        )

        # SW-MSA additive mask, applied in the integer domain: the
        # reference adds the real −100 before IntSoftmax divides by the
        # scale (swin_quant.py:151-155) — equivalently mask/scale here.
        mask_int = None
        if mask is not None:
            nW = mask.shape[0]
            m = jnp.asarray(mask)[None, :, None]  # (1, nW, 1, N, N)
            mask_int = (
                m / jax.lax.stop_gradient(attn.scale)
            )
            attn_5d = attn.q.reshape(Bw // nW, nW, H, N, N) + mask_int
            attn = attn.replace(q=attn_5d.reshape(Bw, H, N, N))

        attn = IntSoftmax(out_bits=8, interp=it, name="int_softmax")(attn)
        if train and self.attn_drop > 0.0:
            attn = quant_dropout(self, attn, self.attn_drop)

        out_q = exact_int_matmul_8x8(attn.q, parts[2])
        out = QTensor(
            q=out_q.transpose(0, 2, 1, 3).reshape(Bw, N, C),
            scale=attn.scale * v_scale,
            bits=32,
        )
        out = QuantAct(8, interp=it, name="qact3")(out, update_stats=train)
        out = QuantLinear(C, interp=it, name="proj")(out)
        out = QuantAct(16, interp=it, name="qact4")(out, update_stats=train)
        if train and self.proj_drop > 0.0:
            out = quant_dropout(self, out, self.proj_drop)
        return out


class SwinBlock(nn.Module):
    """Shifted-window transformer block (swin_quant.py:172-301)."""

    dim: int
    input_resolution: tuple
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    gelu_stable: bool = False
    interp: Interp = SIM

    @nn.compact
    def __call__(self, x1: QTensor, train: bool = False) -> QTensor:
        it = self.interp
        Hr, Wr = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(Hr, Wr) <= ws:
            ws, shift = min(Hr, Wr), 0
        if Hr % ws or Wr % ws:
            raise ValueError(
                f"stage resolution {Hr}x{Wr} not divisible by window {ws}; "
                f"pick img_size/patch_size/window_size so every stage "
                f"divides (the reference has the same constraint — 224/4 "
                f"gives 56,28,14,7 for window 7)"
            )
        B, L, C = x1.shape

        x = IntLayerNorm(self.dim, interp=it, name="norm1")(x1)
        x = QuantAct(8, interp=it, name="qact1")(x, update_stats=train)

        g = x.q.reshape(B, Hr, Wr, C)
        if shift > 0:
            g = jnp.roll(g, (-shift, -shift), axis=(1, 2))
        windows = window_partition(g, ws)
        xw = QTensor(q=windows, scale=x.scale, bits=8)

        mask = sw_attn_mask(Hr, Wr, ws, shift)
        aw = WindowAttention(
            self.dim,
            ws,
            self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            interp=it,
            name="attn",
        )(xw, mask=mask, train=train)

        g = window_reverse(aw.q, ws, Hr, Wr)
        if shift > 0:
            g = jnp.roll(g, (shift, shift), axis=(1, 2))
        a = QTensor(q=g.reshape(B, L, C), scale=aw.scale, bits=16)

        if train and self.drop_path_rate > 0.0:
            a = drop_path(a, self.drop_path_rate, False, self.make_rng("dropout"))
        x2 = QuantAct(16, interp=it, name="qact2")(
            a, identity=x1, update_stats=train
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
            y = drop_path(y, self.drop_path_rate, False, self.make_rng("dropout"))
        return QuantAct(16, interp=it, name="qact4")(
            y, identity=x2, update_stats=train
        )


class PatchMerging(nn.Module):
    """2×2 downsample: gather → concat 4C → I-LayerNorm → 4C→2C linear
    (swin_quant.py:304-358)."""

    input_resolution: tuple
    dim: int
    interp: Interp = SIM

    @nn.compact
    def __call__(self, x: QTensor, train: bool = False) -> QTensor:
        it = self.interp
        Hr, Wr = self.input_resolution
        B, L, C = x.shape
        g = x.q.reshape(B, Hr, Wr, C)
        parts = [
            g[:, 0::2, 0::2], g[:, 1::2, 0::2],
            g[:, 0::2, 1::2], g[:, 1::2, 1::2],
        ]
        q = jnp.concatenate(parts, -1).reshape(B, L // 4, 4 * C)
        y = QTensor(q=q, scale=x.scale, bits=x.bits)
        y = IntLayerNorm(4 * self.dim, interp=it, name="norm")(y)
        y = QuantAct(8, interp=it, name="qact1")(y, update_stats=train)
        y = QuantLinear(2 * self.dim, use_bias=False, interp=it, name="reduction")(y)
        return QuantAct(8, interp=it, name="qact2")(y, update_stats=train)


class SwinTransformer(nn.Module):
    """Hierarchical Swin (swin_quant.py:419-564)."""

    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    remat: bool = False
    # elementwise-stable ShiftGELU (ops/shiftgelu) — recorded at freeze
    gelu_stable: bool = False
    interp: Interp = SIM

    @nn.compact
    def __call__(self, images, train: bool = False):
        it = self.interp
        nl = len(self.depths)
        grid = self.img_size // self.patch_size

        x = QuantAct(8, interp=it, name="qact_input")(images, update_stats=train)
        x = QuantPatchEmbed(
            patch_size=self.patch_size,
            features=self.embed_dim,
            interp=it,
            name="patch_embed",
        )(x)
        # Swin's patch embed normalizes (patch_norm=True default).
        x = QuantAct(8, interp=it, name="qact_before_norm")(x, update_stats=train)
        x = IntLayerNorm(self.embed_dim, interp=it, name="patch_norm")(x)
        x = QuantAct(16, interp=it, name="qact_embed")(x, update_stats=train)

        if self.ape:
            pos_embed = self.param(
                "absolute_pos_embed",
                nn.initializers.truncated_normal(stddev=0.02),
                (1, grid * grid, self.embed_dim),
                jnp.float32,
            )
            pos = QuantAct(16, interp=it, name="qact_pos")(
                pos_embed, update_stats=train
            )
            x = QuantAct(16, interp=it, name="qact1")(
                x,
                identity=pos.replace(q=jnp.broadcast_to(pos.q, x.shape)),
                update_stats=train,
            )
        else:
            x = QuantAct(16, interp=it, name="qact1")(x, update_stats=train)

        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, sum(self.depths))]
        block_cls = (
            nn.remat(SwinBlock, static_argnums=(2,)) if self.remat else SwinBlock
        )
        k = 0
        for i in range(nl):
            dim = self.embed_dim * (2**i)
            res = (grid // (2**i), grid // (2**i))
            for j in range(self.depths[i]):
                x = block_cls(
                    dim=dim,
                    input_resolution=res,
                    num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift_size=0 if j % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    drop_path_rate=dpr[k],
                    gelu_stable=self.gelu_stable,
                    interp=it,
                    name=f"layers_{i}_blocks_{j}",
                )(x, train)  # positional: remat static_argnums counts args
                k += 1
            if i < nl - 1:
                x = PatchMerging(
                    input_resolution=res, dim=dim, interp=it,
                    name=f"layers_{i}_downsample",
                )(x, train=train)

        nf = self.embed_dim * (2 ** (nl - 1))
        x = IntLayerNorm(nf, interp=it, name="norm")(x)
        x = QuantAct(8, interp=it, name="qact2")(x, update_stats=train)
        # token-mean pool (AdaptiveAvgPool1d, swin_quant.py:554); the mean
        # is a fractional carrier that qact3's requant re-rounds.
        x = x.replace(q=jnp.mean(x.q, axis=1))
        x = QuantAct(8, interp=it, name="qact3")(x, update_stats=train)
        logits = QuantLinear(self.num_classes, interp=it, name="head")(x)
        return logits.dequantize()


def _swin(**kw):
    def factory(**overrides):
        cfg = dict(kw)
        cfg.update(overrides)
        return SwinTransformer(**cfg)

    return factory


# Factory configs mirror swin_quant.py:567-627.
swin_tiny_patch4_window7_224 = _swin(
    embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)
)
swin_small_patch4_window7_224 = _swin(
    embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)
)
swin_base_patch4_window7_224 = _swin(
    embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)
)
