"""Float (FP32/bf16) Vision Transformer with the SAME parameter tree as
the quantized model.

The reference's accuracy table compares INT8 against an FP32 baseline
evaluated with timm models (/root/reference/README.md:44-56). Here the
float baseline shares our parameter naming and layout exactly, so one
imported checkpoint serves both columns:

    create_model("deit_small_fp32")   # same params as "deit_small"
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class FloatVisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        B = images.shape[0]
        D, H = self.embed_dim, self.num_heads
        hd = D // H
        p = self.patch_size
        gh = self.img_size // p
        dt = self.dtype

        def dense(x, features, name, use_bias=True):
            return nn.Dense(
                features, use_bias=use_bias, dtype=dt,
                kernel_init=nn.initializers.truncated_normal(stddev=0.02),
                name=name,
            )(x)

        def ln(x, name):
            return nn.LayerNorm(epsilon=1e-6, dtype=dt, name=name,
                                use_fast_variance=False)(x)

        x = images.astype(dt)
        x = x.reshape(B, gh, p, gh, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gh, p * p * 3)
        # patch_embed/proj matches QuantPatchEmbed's matmul layout
        x = nn.Dense(
            D, dtype=dt,
            kernel_init=nn.initializers.truncated_normal(stddev=0.02),
            name="patch_embed_proj",
        )(x)

        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(stddev=0.02),
            (1, 1, D), jnp.float32,
        )
        pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(stddev=0.02),
            (1, gh * gh + 1, D), jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(dt), (B, 1, D)), x], 1
        )
        x = x + pos_embed.astype(dt)

        for i in range(self.depth):
            pre = f"blocks_{i}"
            y = ln(x, f"{pre}_norm1")
            qkv = dense(y, 3 * D, f"{pre}_attn_qkv", use_bias=self.qkv_bias)
            qkv = qkv.reshape(B, -1, 3, H, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = jax.nn.softmax(
                jnp.matmul(q, k.transpose(0, 1, 3, 2)) * hd**-0.5, -1
            )
            ctx = jnp.matmul(attn, v).transpose(0, 2, 1, 3).reshape(B, -1, D)
            x = x + dense(ctx, D, f"{pre}_attn_proj")
            y = ln(x, f"{pre}_norm2")
            y = dense(y, int(D * self.mlp_ratio), f"{pre}_mlp_fc1")
            y = jax.nn.gelu(y, approximate=False)
            x = x + dense(y, D, f"{pre}_mlp_fc2")

        x = ln(x, "norm")[:, 0]
        return dense(x, self.num_classes, "head").astype(jnp.float32)


def quant_params_to_float(params: dict) -> dict:
    """Re-key a quantized VisionTransformer param tree onto the float
    model's flat naming (same arrays, no transforms)."""
    out = {
        "cls_token": params["cls_token"],
        "pos_embed": params["pos_embed"],
        "patch_embed_proj": params["patch_embed"]["proj"],
        "norm": params["norm"],
        "head": params["head"],
    }
    i = 0
    while f"blocks_{i}" in params:
        b = params[f"blocks_{i}"]
        out[f"blocks_{i}_norm1"] = b["norm1"]
        out[f"blocks_{i}_attn_qkv"] = b["attn"]["qkv"]
        out[f"blocks_{i}_attn_proj"] = b["attn"]["proj"]
        out[f"blocks_{i}_norm2"] = b["norm2"]
        out[f"blocks_{i}_mlp_fc1"] = b["mlp"]["fc1"]
        out[f"blocks_{i}_mlp_fc2"] = b["mlp"]["fc2"]
        i += 1
    return out


deit_tiny_fp32 = partial(FloatVisionTransformer, embed_dim=192, depth=12, num_heads=3)
deit_small_fp32 = partial(FloatVisionTransformer, embed_dim=384, depth=12, num_heads=6)
deit_base_fp32 = partial(FloatVisionTransformer, embed_dim=768, depth=12, num_heads=12)
vit_base_fp32 = partial(FloatVisionTransformer, embed_dim=768, depth=12, num_heads=12)
vit_large_fp32 = partial(FloatVisionTransformer, embed_dim=1024, depth=24, num_heads=16)
