"""Integer-only Vision Transformer (DeiT / ViT).

TPU-native rebuild of the reference model
(/root/reference/models/vit_quant.py:146-282): the same
scale-propagation graph — input QuantAct → patch embed → cls concat
(shares the patch scale, vit_quant.py:259-262) → pos-embed quantized
separately then residual-merged (vit_quant.py:264-265) → N pre-norm
blocks → I-LayerNorm → CLS token → QuantAct → quantized head.

Inputs are NHWC float images; output logits are float (the reference
likewise dequantizes only at the head output, vit_quant.py:278-282).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.qtensor import QTensor
from ..nn.quant import IntLayerNorm, QuantAct, QuantLinear, QuantPatchEmbed
from ..nn.vit_blocks import Block
from ..ops import SIM, Interp


class VisionTransformer(nn.Module):
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
    remat: bool = False
    # 16 = the reference's QAT spec; 8 = the precision its deployed TVM
    # graph runs (int8 probabilities + pure int8 attn@V — see
    # nn/vit_blocks.Attention.softmax_bits)
    softmax_bits: int = 16
    # elementwise-stable ShiftGELU (ops/shiftgelu): value-different
    # from the reference's row-max spec, so it must match at training
    # and deploy time — recorded in the frozen artifact
    gelu_stable: bool = False
    # Optional activation hook applied at trunk block boundaries —
    # e.g. parallel.mesh.seq_constraint(mesh) shards the token axis for
    # Megatron-style sequence parallelism. Value-identity is pinned by
    # tests/test_sp.py. None = no constraint (single-chip default).
    act_constraint: Optional[Callable[..., "QTensor"]] = None
    interp: Interp = SIM

    @nn.compact
    def __call__(self, images, train: bool = False):
        it = self.interp
        B = images.shape[0]
        num_patches = (self.img_size // self.patch_size) ** 2

        x = QuantAct(8, interp=it, name="qact_input")(images, update_stats=train)
        x = QuantPatchEmbed(
            patch_size=self.patch_size,
            features=self.embed_dim,
            interp=it,
            name="patch_embed",
        )(x)
        x = QuantAct(16, interp=it, name="qact_embed")(x, update_stats=train)

        # cls token is concatenated sharing the patch scale: quantize it
        # at the current scale (vit_quant.py:259-262).
        cls_token = self.param(
            "cls_token",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, 1, self.embed_dim),
            jnp.float32,
        )
        # it.round (STE in SIM): the reference concatenates the RAW
        # float cls onto the quantized patch tokens (vit_quant.py:259-
        # 262) and lets qact1's fixedpoint chain carry its gradient —
        # the cls token TRAINS there. A plain jnp.round here zeroed
        # d(loss)/d(cls_token), silently freezing the token at init
        # (caught by tests/test_ref_model_differential.py's parameter-
        # gradient differential). Rounding (vs the reference's raw
        # float concat) is deliberate: the deploy engine needs an
        # integer cls carrier, and SIM must stay bit-identical to it.
        cls_q = it.round(cls_token / jax.lax.stop_gradient(x.scale))
        cls_q = jnp.broadcast_to(cls_q, (B, 1, self.embed_dim))
        x = x.replace(q=jnp.concatenate([cls_q, x.q], axis=1))

        # Positional embedding quantized at its own scale, then merged via
        # the dual-scale residual requant (vit_quant.py:264-265).
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, num_patches + 1, self.embed_dim),
            jnp.float32,
        )
        pos = QuantAct(16, interp=it, name="qact_pos")(pos_embed, update_stats=train)
        x = QuantAct(16, interp=it, name="qact1")(
            x, identity=pos.replace(q=jnp.broadcast_to(pos.q, x.shape)),
            update_stats=train,
        )

        # Stochastic-depth decay rule; numpy (not jnp) so the per-block
        # rates stay static Python floats under jit.
        dpr = [
            float(r) for r in np.linspace(0.0, self.drop_path_rate, self.depth)
        ]
        # jax.checkpoint per block: trade recompute for activation memory
        # (the reference's use_checkpoint plumbing was broken — it dropped
        # the scaling factor, swin_quant.py:407-408; here the QTensor
        # pytree remats whole).
        block_cls = (
            nn.remat(Block, static_argnums=(2,)) if self.remat else Block
        )
        if self.act_constraint is not None:
            x = self.act_constraint(x)
        for i in range(self.depth):
            x = block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=dpr[i],
                softmax_bits=self.softmax_bits,
                gelu_stable=self.gelu_stable,
                interp=it,
                name=f"blocks_{i}",
            )(x, train)  # positional: remat static_argnums counts args
            if self.act_constraint is not None:
                x = self.act_constraint(x)

        x = IntLayerNorm(self.embed_dim, interp=it, name="norm")(x)
        x = x.replace(q=x.q[:, 0])  # CLS token
        x = QuantAct(8, interp=it, name="qact2")(x, update_stats=train)
        logits = QuantLinear(self.num_classes, interp=it, name="head")(x)
        return logits.dequantize()


# Factory configs mirror /root/reference/models/vit_quant.py:285-381.
deit_tiny_patch16_224 = partial(
    VisionTransformer, embed_dim=192, depth=12, num_heads=3
)
deit_small_patch16_224 = partial(
    VisionTransformer, embed_dim=384, depth=12, num_heads=6
)
deit_base_patch16_224 = partial(
    VisionTransformer, embed_dim=768, depth=12, num_heads=12
)
vit_base_patch16_224 = partial(
    VisionTransformer, embed_dim=768, depth=12, num_heads=12
)
vit_large_patch16_224 = partial(
    VisionTransformer, embed_dim=1024, depth=24, num_heads=16
)
