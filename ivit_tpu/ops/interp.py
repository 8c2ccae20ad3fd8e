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


import jax


@jax.custom_vjp
def _exp2_int_sim(k):
    """SIM-side exp2: forward is bit-exactly the DEPLOY ldexp value,
    gradient is the transcendental's ``ln2·2^k`` (the reference
    backprops through ``2**(n−q)``, quant_modules.py:420).

    custom_vjp rather than the ``a + sg(b − a)`` residue trick: that
    form is only value-exact when ``b − a`` is representable relative
    to ``a`` — it both NaNs at f32-overflowing ``k`` (inf − inf) and
    can round ``a + (b−a)`` away from ``b`` near ulp boundaries."""
    return _exp2_int_fast(k)


def _exp2_sim_fwd(k):
    return _exp2_int_fast(k), k


def _exp2_sim_bwd(k, g):
    # 2^k via the same exact ldexp (== exp2(k) for in-range integer k,
    # and finite where the transcendental would overflow)
    return (g * 0.6931471805599453 * _exp2_int_fast(k),)


_exp2_int_sim.defvjp(_exp2_sim_fwd, _exp2_sim_bwd)


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
        quant_utils.py:255-261).

        The STE uses the exact residue form ``sg(clipped) + (x − sg(x))``
        (value ≡ clipped bit-for-bit since ``x − x = 0`` exactly; the
        parenthesisation matters — ``(clipped + x) − x`` re-absorbs the
        clip below x's ulp), NOT ``x + sg(clipped − x)``: that form
        cancels catastrophically when ``|x| ≫ hi`` — e.g. shift-exp of
        a large positive input yields x ≈ 1.2e18, where f32
        ``clipped − x`` rounds to ``−x`` and the clip silently returned
        0 instead of 2^31−1, breaking SIM↔DEPLOY parity on all-negative
        GELU rows."""
        import jax

        clipped = jnp.clip(x, lo, hi)
        if self.is_sim:
            return jax.lax.stop_gradient(clipped) + (
                x - jax.lax.stop_gradient(x)
            )
        return clipped


SIM = Interp(
    floor=floor_ste, round=round_ste, is_sim=True, exp2=_exp2_int_sim
)
DEPLOY = Interp(
    floor=jnp.floor, round=jnp.round, is_sim=False, exp2=_exp2_int_fast
)
