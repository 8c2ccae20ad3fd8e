from .interp import SIM, DEPLOY, Interp
from .requant import requantize
from .shiftexp import int_exp_shift
from .shiftmax import shiftmax, shiftmax_int_deploy
from .shiftgelu import (
    gelu_int_lanes_valid,
    shiftgelu,
    shiftgelu_stable_int_deploy,
)
from .intnorm import int_layernorm

__all__ = [
    "SIM",
    "DEPLOY",
    "Interp",
    "requantize",
    "int_exp_shift",
    "shiftmax",
    "shiftmax_int_deploy",
    "shiftgelu",
    "shiftgelu_stable_int_deploy",
    "gelu_int_lanes_valid",
    "int_layernorm",
]
