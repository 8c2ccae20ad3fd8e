"""Tensor-parallel deployment of the frozen int8 engines.

The reference's deployment path is single-GPU, batch-1 only (its TVM
harness hard-asserts it, /root/reference/TVM_benchmark/models/
build_model.py:59-60). ``shard_infer`` already scales serving over a
``data`` axis bit-identically; this module adds the **model axis**: the
engine's int8 weight matrices (and int32 biases) are threaded through
``jit`` as *arguments* laid out by the same Megatron-style rules the
trainer uses (``parallel.mesh._PARAM_RULES``: qkv/fc1 column-parallel,
proj/fc2 row-parallel, head column-parallel), so GSPMD partitions every
block matmul over the ``model`` axis and inserts int32 all-reduces at
the row-parallel outputs.

Why the result is BIT-identical to single-device execution: every
cross-shard reduction the partitioning can create is an **integer** sum
over int32 accumulators — exact and associative, unlike float partials
— and sharding never changes values, only placement. Any logit
deviation is therefore a sharding bug by construction
(tests/test_deploy_parallel.py asserts equality to the bit for both
families, alone and composed with the data axis).

Why only the ``w``/``b`` leaves are threaded as arguments: the engine
builders specialize *host* math on concrete scale values (``static_p``
guard elisions, dyadic ratio decompositions — deploy/engine.py), and
the Swin builder pads host-numpy bias/mask buffers inside the traced
block (deploy/swin_engine.py); those must stay compile-time constants.
The weight matrices are exactly the leaves a TP layout needs to
partition — everything else is O(channels) and stays replicated.

When to use: the reference's model matrix (<= ViT-L, ~0.3 GB int8) fits
one v5e chip, so pure DP remains the default serving layout; the model
axis exists for deployments past one chip's HBM or latency envelope
(KV-less ViT inference is weight-dominated, so per-chip weight bytes
shrink by the TP degree — asserted on the addressable shards in the
tests), and for mesh-shape symmetry with training (a (data, model)
pool can serve without re-laying out the artifact).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import data_sharding

# (path-suffix, spec) — first match wins; mirrors mesh._PARAM_RULES
# (kernels stored (in, out); column-parallel shards out, row-parallel in).
_TP_WEIGHT_RULES = (
    ("qkv/w", (None, "model")),
    ("qkv/b", ("model",)),
    ("proj/w", ("model", None)),
    ("fc1/w", (None, "model")),
    ("fc1/b", ("model",)),
    ("fc2/w", ("model", None)),
    ("head/w", (None, "model")),
    ("head/b", ("model",)),
)


@dataclass(frozen=True)
class _Slot:
    """Placeholder marking an extracted weight's position in the
    artifact skeleton (filled back with the traced argument)."""

    index: int


def _match(path: str):
    for frag, spec in _TP_WEIGHT_RULES:
        if path.endswith(frag):
            return spec
    return None


def _extract(node, path, out):
    """Walk the artifact, replacing rule-matched integer weight leaves
    with slots; returns the skeleton. ``out`` collects (path, array)."""
    if isinstance(node, dict):
        return {k: _extract(v, f"{path}/{k}" if path else k, out)
                for k, v in node.items()}
    if isinstance(node, list):
        return [_extract(v, f"{path}/{i}", out)
                for i, v in enumerate(node)]
    if (
        isinstance(node, np.ndarray)
        and node.dtype.kind in "iu"
        and _match(path) is not None
    ):
        out.append((path, node))
        return _Slot(len(out) - 1)
    return node


def _fill(node, weights):
    if isinstance(node, dict):
        return {k: _fill(v, weights) for k, v in node.items()}
    if isinstance(node, list):
        return [_fill(v, weights) for v in node]
    if isinstance(node, _Slot):
        return weights[node.index]
    return node


def _spec_for(path: str, arr: np.ndarray, n_model: int) -> P:
    spec = _match(path)
    if spec is None or len(spec) != arr.ndim:
        return P()
    # Replicate anything the model axis doesn't divide evenly (e.g. a
    # 10-class head on an 8-wide axis) — values are unaffected either way.
    for dim, axis in enumerate(spec):
        if axis is not None and arr.shape[dim] % n_model != 0:
            return P()
    return P(*spec)


def tp_weight_shardings(artifact: dict, mesh: Mesh):
    """(skeleton, weights, shardings) for ``shard_infer_tp`` — exposed
    separately so tests can assert the per-chip shard shapes."""
    out: list = []
    skeleton = _extract(artifact, "", out)
    n_model = mesh.shape["model"]
    weights = [w for _, w in out]
    shardings = [
        NamedSharding(mesh, _spec_for(p, w, n_model)) for p, w in out
    ]
    return skeleton, weights, shardings


def shard_infer_tp(artifact: dict, mesh: Mesh, build_fn=None, **build_opts):
    """Tensor(×data)-parallel engine forward over a ``(data, model)``
    mesh: ``images (global batch) → logits``, bit-identical to the
    single-device engine.

    ``build_fn`` defaults to ``deploy.build_vit_infer``; pass
    ``deploy.swin_engine.build_swin_infer`` (with its ``window_size``
    etc. in ``build_opts``) for the Swin family. The global batch must
    be divisible by ``mesh.shape['data']``.
    """
    if build_fn is None:
        from ..deploy.engine import build_vit_infer

        build_fn = build_vit_infer
    skeleton, weights, shardings = tp_weight_shardings(artifact, mesh)
    x_sh = data_sharding(mesh)

    def f(w, images):
        return build_fn(_fill(skeleton, w), **build_opts)(images)

    jitted = jax.jit(f, in_shardings=(shardings, x_sh), out_shardings=x_sh)
    w_dev = jax.device_put(weights, shardings)
    return lambda images: jitted(w_dev, images)
