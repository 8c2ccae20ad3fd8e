"""ivit_tpu: TPU-native integer-only Vision Transformer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of I-ViT
(zkkli/I-ViT, ICCV 2023): integer-only quantization-aware training and
deployment of ViT/DeiT/Swin with Shiftmax, ShiftGELU and I-LayerNorm,
designed TPU-first (MXU int8 matmuls, VPU shift arithmetic, pjit/mesh
data- and tensor-parallelism, AOT-compiled deployment).
"""

__version__ = "0.1.0"

from . import core, ops  # light imports; nn/models/train pull flax lazily

__all__ = ["core", "ops", "__version__"]
