from .quant import (
    QuantAct,
    QuantLinear,
    QuantConv2d,
    QuantPatchEmbed,
    IntLayerNorm,
    IntGELU,
    IntSoftmax,
    quant_matmul,
)
from .vit_blocks import Mlp, Attention, Block, drop_path

__all__ = [
    "QuantAct",
    "QuantLinear",
    "QuantConv2d",
    "QuantPatchEmbed",
    "IntLayerNorm",
    "IntGELU",
    "IntSoftmax",
    "quant_matmul",
    "Mlp",
    "Attention",
    "Block",
    "drop_path",
]
