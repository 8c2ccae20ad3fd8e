"""Serialized compiled-engine artifacts (StableHLO via jax.export).

The reference's deployment product is a TVM ``GraphModule`` built from
Relay + tuned CUDA kernels (/root/reference/TVM_benchmark/
evaluate_latency.py:76-88) — a self-contained compiled graph that runs
without the model-building Python. The TPU-native analogue: export the
jitted integer engine to StableHLO bytes that reload and execute with
no ``ivit_tpu`` model code on the serving host (only jax).

The exported function is shape-specialized (batch size fixed at export
time, like the reference's ``get_workload(batch_size)``) and carries
the frozen integer weights as constants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_engine(
    infer_fn,
    batch_size: int,
    img_size: int = 224,
    path: str | None = None,
) -> bytes:
    """Serialize a jitted engine forward to StableHLO bytes.

    ``infer_fn``: a builder product (build_vit_infer / build_swin_infer
    closure). Returns the serialized bytes; writes them to ``path`` when
    given.
    """
    spec = jax.ShapeDtypeStruct(
        (batch_size, img_size, img_size, 3), jnp.float32
    )
    exp = jax_export.export(jax.jit(infer_fn))(spec)
    data = exp.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


def load_engine(path_or_bytes):
    """Deserialize an exported engine; returns a callable
    ``images -> logits`` (jit-compiled on first call)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    exp = jax_export.deserialize(data)
    return jax.jit(exp.call)
