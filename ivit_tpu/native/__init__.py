from .bindings import (
    oracle_available,
    dyadic_decompose_oracle,
    dyadic_mul_oracle,
    shiftmax_oracle,
    shiftgelu_oracle,
    int_layernorm_oracle,
)

__all__ = [
    "oracle_available",
    "dyadic_decompose_oracle",
    "dyadic_mul_oracle",
    "shiftmax_oracle",
    "shiftgelu_oracle",
    "int_layernorm_oracle",
]
