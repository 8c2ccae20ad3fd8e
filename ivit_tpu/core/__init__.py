from .qtensor import QTensor, int_range
from .ste import floor_ste, round_ste, quantize
from .quantizers import symmetric_scale, per_channel_minmax, weight_scale
from .dyadic import (
    dyadic_decompose,
    dyadic_mul_exact,
    dyadic_requant,
    requant_f32,
)

__all__ = [
    "QTensor",
    "int_range",
    "floor_ste",
    "round_ste",
    "quantize",
    "symmetric_scale",
    "per_channel_minmax",
    "weight_scale",
    "dyadic_decompose",
    "dyadic_mul_exact",
    "dyadic_requant",
    "requant_f32",
]
