"""QTensor: the universal currency of the framework.

The reference implementation (I-ViT) threads ``(tensor, scaling_factor)``
tuples through every layer (e.g. /root/reference/models/vit_quant.py:59-88).
We replace that with a registered pytree so the pair can flow through
``jax.jit`` / ``pjit`` / ``jax.grad`` as one value and cannot be mis-paired.

Conventions
-----------
* ``q`` holds *integer-valued* numbers. During QAT simulation it is a
  float32 array carrying exact integers (so straight-through gradients can
  flow); during deployment it is a true integer array (int8/int16/int32).
* ``scale`` is float32 with shape ``()`` (per-tensor) or ``(C,)``
  (per-out-channel, broadcasting against the last axis) — mirroring the
  reference's per-channel weight scales meeting per-tensor activation
  scales (/root/reference/models/quantization_utils/quant_utils.py:12-48).
* The represented real value is always ``q * scale``.
* ``bits`` is static metadata (not traced).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class QTensor:
    """An integer-valued tensor together with its quantization scale."""

    q: jax.Array
    scale: jax.Array
    bits: int = struct.field(pytree_node=False, default=8)

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def dtype(self):
        return self.q.dtype

    def dequantize(self) -> jax.Array:
        """Recover the real-valued tensor ``q * scale``.

        ``scale`` broadcasts against the last axis (per-channel) or is a
        scalar (per-tensor).
        """
        return self.q.astype(jnp.float32) * self.scale

    # Alias used throughout model code.
    @property
    def x(self) -> jax.Array:
        return self.dequantize()

    def astype(self, dtype) -> "QTensor":
        return self.replace(q=self.q.astype(dtype))

    def reshape(self, *shape) -> "QTensor":
        return self.replace(q=self.q.reshape(*shape))

    def transpose(self, *axes) -> "QTensor":
        return self.replace(q=self.q.transpose(*axes))


def int_range(bits: int):
    """Symmetric two's-complement range ``[-2^(b-1), 2^(b-1)-1]``.

    Matches the clamp in the reference SymmetricQuantFunction
    (/root/reference/models/quantization_utils/quant_utils.py:90-92).
    """
    n = 2 ** (bits - 1) - 1
    return -n - 1, n
