"""Interpreter parameterization: one integer-op spec, two executions.

The reference maintains *two* hand-synchronized implementations of every
integer operator — a PyTorch QAT version (quant_modules.py) and a TVM
Relay deploy version (TVM_benchmark/models/layers.py) — and they drifted
(e.g. softmax n=15 vs n=16, 16-bit vs 8-bit outputs; see
/root/reference/models/quantization_utils/quant_modules.py:458 vs
/root/reference/TVM_benchmark/models/layers.py:377).

Here every integer op is written exactly once against this tiny
interpreter interface:

* ``SIM``    — QAT: floor/round are straight-through (identity-gradient)
  so the optimizer can train through the integer pipeline.
* ``DEPLOY`` — inference: plain floor/round, no autodiff machinery.

Both run the same float32 integer-carrier arithmetic, so QAT sees
bit-identical forward numerics to the deployed graph by construction.
(int8/int32 dtypes appear only at MXU matmul boundaries in the deploy
engine — elementwise integer math runs on the VPU in f32 lanes, which is
the TPU-native choice; f32 carries every integer that matters here and
deviations beyond 2^24 are part of the spec on both sides equally.)
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from ..core.ste import floor_ste, round_ste


def _exp2_int_fast(k):
    """Exact 2^k for integer-valued f32 ``k`` ≥ −126, built by writing
    the float32 exponent field directly (ldexp) — replaces the
    transcendental ``exp2``, which both dominates the deploy-side
    shift-exp cost and is only approximate (XLA's polynomial exp2 can
    return 2047.9999 for k=11, flipping downstream floors)."""
    import jax

    ki = k.astype(jnp.int32)
    return jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)


def _exp2_int_sim(k):
    """SIM-side exp2: the exact ldexp value (bit-matching DEPLOY) with
    the transcendental's gradient (the reference backprops through
    ``2**(n−q)``, quant_modules.py:420)."""
    import jax

    return jnp.exp2(k) + jax.lax.stop_gradient(
        _exp2_int_fast(k) - jnp.exp2(k)
    )


@dataclasses.dataclass(frozen=True)
class Interp:
    """Floor/round primitives for one interpreter."""

    floor: Callable
    round: Callable
    is_sim: bool
    exp2: Callable = jnp.exp2

    def clip(self, x, lo, hi):
        """Clamp with STE semantics in sim mode (the reference's clamps
        never mask gradients: fixedpoint_mul.backward is unconditional,
        quant_utils.py:255-261)."""
        import jax

        clipped = jnp.clip(x, lo, hi)
        if self.is_sim:
            return x + jax.lax.stop_gradient(clipped - x)
        return clipped


SIM = Interp(
    floor=floor_ste, round=round_ste, is_sim=True, exp2=_exp2_int_sim
)
DEPLOY = Interp(
    floor=jnp.floor, round=jnp.round, is_sim=False, exp2=_exp2_int_fast
)
