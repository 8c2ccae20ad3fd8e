from .shiftmax_fused import fused_requant_shiftmax
from .shiftgelu_fused import fused_requant_shiftgelu
from .intnorm_fused import fused_layernorm_requant

__all__ = [
    "fused_requant_shiftmax",
    "fused_requant_shiftgelu",
    "fused_layernorm_requant",
]
