"""Float Swin Transformer sharing the quantized model's parameter tree —
the FP32 column of the accuracy table for the Swin family
(/root/reference/README.md:55-56).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .swin import relative_position_index, sw_attn_mask, window_partition, window_reverse


class FloatSwinTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 4
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    ape: bool = False
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        B = images.shape[0]
        D = self.embed_dim
        p = self.patch_size
        grid = self.img_size // p
        dt = self.dtype

        def dense(x, features, name, use_bias=True):
            return nn.Dense(
                features, use_bias=use_bias, dtype=dt,
                kernel_init=nn.initializers.truncated_normal(stddev=0.02),
                name=name,
            )(x)

        def ln(x, name):
            # torch nn.LayerNorm default eps — the reference's float
            # Swin path uses it unchanged (swin_quant.py:192 norm_layer)
            return nn.LayerNorm(epsilon=1e-5, dtype=dt, name=name,
                                use_fast_variance=False)(x)

        x = images.astype(dt)
        x = x.reshape(B, grid, p, grid, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, grid * grid, p * p * 3)
        x = dense(x, D, "patch_embed_proj")
        x = ln(x, "patch_norm")

        if self.ape:
            pos = self.param(
                "absolute_pos_embed",
                nn.initializers.truncated_normal(stddev=0.02),
                (1, grid * grid, D), jnp.float32,
            )
            x = x + pos.astype(dt)

        nl = len(self.depths)
        for i in range(nl):
            dim = D * 2**i
            res = grid // 2**i
            for j in range(self.depths[i]):
                pre = f"layers_{i}_blocks_{j}"
                H = self.num_heads[i]
                hd = dim // H
                ws = min(self.window_size, res)
                shift = 0 if (j % 2 == 0 or res <= self.window_size) else (
                    self.window_size // 2
                )

                y = ln(x, f"{pre}_norm1")
                g = y.reshape(B, res, res, dim)
                if shift > 0:
                    g = jnp.roll(g, (-shift, -shift), axis=(1, 2))
                xw = window_partition(g, ws)  # (B·nW, N, dim)
                Bw, N, _ = xw.shape

                qkv = dense(xw, 3 * dim, f"{pre}_attn_qkv",
                            use_bias=self.qkv_bias)
                qkv = qkv.reshape(Bw, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                attn = jnp.matmul(q, k.transpose(0, 1, 3, 2)) * hd**-0.5

                table = self.param(
                    f"{pre}_attn_relative_position_bias_table",
                    nn.initializers.truncated_normal(stddev=0.02),
                    ((2 * ws - 1) ** 2, H), jnp.float32,
                )
                idx = relative_position_index(ws).reshape(-1)
                bias = table[idx].reshape(N, N, H).transpose(2, 0, 1)
                attn = attn + bias[None].astype(dt)

                mask = sw_attn_mask(res, res, ws, shift)
                if mask is not None:
                    nW = mask.shape[0]
                    attn = (
                        attn.reshape(Bw // nW, nW, H, N, N)
                        + jnp.asarray(mask, dt)[None, :, None]
                    ).reshape(Bw, H, N, N)

                attn = jax.nn.softmax(attn, -1)
                ctx = jnp.matmul(attn, v).transpose(0, 2, 1, 3).reshape(Bw, N, dim)
                ctx = dense(ctx, dim, f"{pre}_attn_proj")

                g = window_reverse(ctx, ws, res, res)
                if shift > 0:
                    g = jnp.roll(g, (shift, shift), axis=(1, 2))
                x = x + g.reshape(B, res * res, dim)

                y = ln(x, f"{pre}_norm2")
                y = dense(y, int(dim * self.mlp_ratio), f"{pre}_mlp_fc1")
                y = jax.nn.gelu(y, approximate=False)
                x = x + dense(y, dim, f"{pre}_mlp_fc2")

            if i < nl - 1:
                g = x.reshape(B, res, res, dim)
                parts = [g[:, 0::2, 0::2], g[:, 1::2, 0::2],
                         g[:, 0::2, 1::2], g[:, 1::2, 1::2]]
                x = jnp.concatenate(parts, -1).reshape(B, -1, 4 * dim)
                x = ln(x, f"layers_{i}_downsample_norm")
                x = dense(x, 2 * dim, f"layers_{i}_downsample_reduction",
                          use_bias=False)

        x = ln(x, "norm")
        x = jnp.mean(x, axis=1)
        return dense(x, self.num_classes, "head").astype(jnp.float32)


def swin_quant_params_to_float(params: dict) -> dict:
    """Re-key a quantized SwinTransformer param tree onto the float
    model's flat naming."""
    out = {
        "patch_embed_proj": params["patch_embed"]["proj"],
        "patch_norm": params["patch_norm"],
        "norm": params["norm"],
        "head": params["head"],
    }
    if "absolute_pos_embed" in params:
        out["absolute_pos_embed"] = params["absolute_pos_embed"]
    for name, sub in params.items():
        if name.startswith("layers_") and "_blocks_" in name:
            out[f"{name}_norm1"] = sub["norm1"]
            out[f"{name}_norm2"] = sub["norm2"]
            out[f"{name}_attn_qkv"] = sub["attn"]["qkv"]
            out[f"{name}_attn_proj"] = sub["attn"]["proj"]
            out[f"{name}_attn_relative_position_bias_table"] = sub["attn"][
                "relative_position_bias_table"
            ]
            out[f"{name}_mlp_fc1"] = sub["mlp"]["fc1"]
            out[f"{name}_mlp_fc2"] = sub["mlp"]["fc2"]
        elif name.endswith("_downsample"):
            out[f"{name}_norm"] = sub["norm"]
            out[f"{name}_reduction"] = sub["reduction"]
    return out


swin_tiny_fp32 = partial(
    FloatSwinTransformer, embed_dim=96, depths=(2, 2, 6, 2),
    num_heads=(3, 6, 12, 24),
)
swin_small_fp32 = partial(
    FloatSwinTransformer, embed_dim=96, depths=(2, 2, 18, 2),
    num_heads=(3, 6, 12, 24),
)
swin_base_fp32 = partial(
    FloatSwinTransformer, embed_dim=128, depths=(2, 2, 18, 2),
    num_heads=(4, 8, 16, 32),
)
