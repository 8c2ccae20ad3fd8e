"""Shift-based integer exponential (the I-ViT "shift-exp" trick).

Computes ``exp(x)`` for non-positive integer inputs using only shifts and
adds: ``x·log2(e) ≈ x + x/2 − x/16``, then decompose by the integer that
represents −1 and reconstruct ``2^(n−q)·(r/2 − x0)``.

Reference: ``int_exp_shift`` in IntGELU/IntSoftmax
(/root/reference/models/quantization_utils/quant_modules.py:410-423,
469-481) and the Relay deploy twin
(/root/reference/TVM_benchmark/models/layers.py:353-368).

Spec notes (deliberate, applied identically in sim and deploy):
* ``(r/2 − x0)·2^(n−q)`` is computed as ``(r − 2·x0)·2^(n−q−1)`` so the
  value stays integral until the final floor.
* Results saturate at 2^31−1 (the reference only clamps the *sum*
  downstream; on real int32 lanes saturation must happen here).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .interp import Interp

_I32_MAX = 2.0**31 - 1.0


def int_exp_shift(
    q: jax.Array,
    scale: jax.Array,
    n: int,
    interp: Interp,
    elide_clamp: bool = False,
    elide_clip: bool = False,
):
    """Integer shift-exp of integer values ``q`` held at ``scale``.

    Returns ``(exp_int, exp_scale)`` with ``exp_scale = scale / 2^n``.

    The two ``elide_*`` flags drop guards that provably cannot bind —
    **value-identical** under the caller-checked static conditions
    (deploy-side VPU op-count reduction; the chains run at VPU peak, see
    BENCH_NOTES):

    * ``elide_clamp``: skip ``max(q, n·x0)``. Valid when the input
      domain bound L ≤ 0 (``q ≥ L``) satisfies
      ``L + ⌊L/2⌋ − ⌊L/16⌋ ≥ n·x0``; since the log2(e) map is monotone,
      no input can reach the clamp.
    * ``elide_clip``: skip the ``[0, 2^31−1]`` clip. The value is
      structurally positive (``r − 2x0 > −x0 > 0``) and bounded by
      ``|x0|·2^n`` (max at qt=0), so the clip is dead when
      ``|x0|·2^n ≤ 2^31−1``.
    """
    scale = jax.lax.stop_gradient(scale)
    # x * log2(e) ~= x + x>>1 - x>>4 (exact: q/2 and q/16 are exact in f32)
    q = q + interp.floor(q / 2.0) - interp.floor(q / 16.0)

    # x0 = floor(-1/scale): the integer representing -1 (negative).
    x0 = jnp.floor(-1.0 / scale)
    if not elide_clamp:
        q = jnp.maximum(q, n * x0)

    qt = interp.floor(q / x0)          # quotient (>= 0 for q <= 0)
    r = q - x0 * qt                    # remainder in (x0, 0]
    # (r/2 - x0) * 2^(n-qt) == (r - 2*x0) * 2^(n-qt-1)
    exp_int = interp.floor((r - 2.0 * x0) * interp.exp2(n - 1.0 - qt))
    if not elide_clip:
        exp_int = interp.clip(exp_int, 0.0, _I32_MAX)
    return exp_int, scale / (2.0**n)


def exp_elisions(static_p: int | None, n: int, in_lo: float):
    """Decide the shift-exp guard elisions for a *statically known*
    ``p = |⌊−1/scale⌋|`` (deploy engines freeze scales at build time).

    ``in_lo``: lower bound of the integer input domain (e.g. −255 for an
    int8 tensor minus its row max). Margins of a few units guard against
    host/device disagreement in computing ``p`` itself (the same
    host-vs-TPU f32 division tie concern as engine._scale).

    Returns ``(elide_clamp, elide_clip)`` — both False when
    ``static_p`` is None (the dynamic-scale / SIM path keeps all guards).
    """
    if static_p is None:
        return False, False
    if math.isfinite(in_lo):
        lo = in_lo + math.floor(in_lo / 2.0) - math.floor(in_lo / 16.0)
        elide_clamp = lo >= n * -(static_p - 2)  # p margin: 2
    else:
        elide_clamp = False
    elide_clip = (static_p + 2) * 2.0**n <= _I32_MAX
    return elide_clamp, elide_clip
