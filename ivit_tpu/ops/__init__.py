from .interp import SIM, DEPLOY, Interp
from .requant import requantize
from .shiftexp import int_exp_shift
from .shiftmax import shiftmax
from .shiftgelu import shiftgelu
from .intnorm import int_layernorm

__all__ = [
    "SIM",
    "DEPLOY",
    "Interp",
    "requantize",
    "int_exp_shift",
    "shiftmax",
    "shiftgelu",
    "int_layernorm",
]
