"""Device mesh and sharding rules.

TPU-native replacement for the reference's dormant NCCL/DDP plumbing
(/root/reference/utils/utils.py:215-237, never invoked): instead of
process-group bootstrap + DDP wrappers, we lay a 2-D ``(data, model)``
mesh over the chips and let pjit/GSPMD insert the collectives.

* ``data`` axis — batch parallelism: the gradient all-reduce the
  reference's DDP would have done rides ICI automatically once the batch
  is sharded on this axis.
* ``model`` axis — tensor parallelism for the wide matmuls (qkv/proj and
  MLP kernels sharded on the hidden dimension). Models at I-ViT scale
  (≤ ViT-L, 307M params) fit on one chip, so ``model=1`` is the default;
  the axis exists so larger deployments are a mesh-shape change, not a
  code change (SURVEY.md §2.5).

Sharding assignment is rule-based over parameter paths so model code
stays sharding-agnostic (the "pick a mesh, annotate, let XLA insert
collectives" recipe).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-substring, PartitionSpec) — first match wins. Kernels are stored
# (in, out): column-parallel layers shard the out axis, row-parallel
# layers the in axis (Megatron-style pairing keeps the activation
# all-reduce to one per block half).
_PARAM_RULES = (
    ("qkv/kernel", P(None, "model")),
    ("qkv/bias", P("model")),
    ("attn/proj/kernel", P("model", None)),
    ("fc1/kernel", P(None, "model")),
    ("fc1/bias", P("model")),
    ("fc2/kernel", P("model", None)),
    ("head/kernel", P(None, "model")),
    ("head/bias", P("model")),
)


def make_mesh(
    data: Optional[int] = None, model: int = 1, devices=None
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: shard the leading axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for(path: str, ndim: int, model_size: int) -> P:
    if model_size > 1:
        for frag, spec in _PARAM_RULES:
            if frag in path and len(spec) <= ndim:
                return spec
    return P()


def _add_axis(leaf, base: NamedSharding, mesh: Mesh, axis: str) -> NamedSharding:
    """Extend ``base``'s spec with ``axis`` on the largest still-free
    evenly divisible dim of ``leaf`` (``base`` unchanged when nothing
    divides — scalars, tiny vectors, fully TP-occupied shapes).

    Composing instead of replacing matters: the AdamW moments already
    follow the kernels' TP layout under :func:`param_shardings`, so a
    data-only respec would *lose* the model-axis partition and cap the
    saving at 2x on a (data, model) mesh.
    """
    n = mesh.shape[axis]
    ndim = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    spec = list(base.spec) + [None] * (ndim - len(base.spec))
    dims = [
        i
        for i in range(ndim)
        if spec[i] is None and shape[i] >= n and shape[i] % n == 0
    ]
    if not dims:
        return base
    spec[max(dims, key=lambda i: shape[i])] = axis
    return NamedSharding(mesh, P(*spec))


def zero1_shardings(state, mesh: Mesh, include_ema: bool = True):
    """ZeRO-1-style state sharding: params follow the TP rules
    (:func:`param_shardings`), while the optimizer moments — and
    optionally the EMA copy — are partitioned over the ``data`` axis on
    their largest divisible dimension.

    AdamW keeps two f32 moments per parameter; together with the EMA
    copy that is 3× the model in per-chip HBM under plain DP. Sharding
    them over ``data`` — composed on top of the model-axis spec the
    moments inherit from the TP rules, so a (data, model) mesh divides
    by the FULL device count — cuts that term by the DP degree; the moment
    update and EMA blend are elementwise, so GSPMD keeps them local to
    each shard (the reduce-scatter/all-gather placement around the
    gradient is XLA's call). The optimizer *math* is unchanged — the
    sharded step must match the replicated step (tests/test_zero1.py).
    """
    base = param_shardings(state, mesh)
    opt = jax.tree.map(
        lambda leaf, b: _add_axis(leaf, b, mesh, "data"),
        state.opt_state,
        base.opt_state,
    )
    kw = {"opt_state": opt}
    if include_ema and getattr(state, "ema_params", None) is not None:
        kw["ema_params"] = jax.tree.map(
            lambda leaf, b: _add_axis(leaf, b, mesh, "data"),
            state.ema_params,
            base.ema_params,
        )
    return base.replace(**kw)


def seq_constraint(mesh: Mesh):
    """Megatron-style sequence parallelism for the trunk activations.

    Returns an activation hook (``models.vit.VisionTransformer
    .act_constraint``) that pins block-boundary activations to
    ``P('data', 'model', None)`` — the token axis sharded over the SAME
    axis the TP kernels use. GSPMD then converts the TP all-reduces at
    the row-parallel outputs into reduce-scatter + all-gather pairs and
    runs the LayerNorm/requant chains between matmuls on 1/model of the
    tokens per chip, cutting both the replicated VPU work and the
    boundary HBM traffic of the non-matmul segments (the standard
    sequence-parallel rewrite; value-identical because every chain op is
    per-token).
    """
    sh = NamedSharding(mesh, P("data", "model", None))

    def constrain(x):
        q = jax.lax.with_sharding_constraint(x.q, sh)
        return x.replace(q=q)

    return constrain


def shard_infer(infer_fn, mesh: Mesh):
    """Data-parallel deployment: jit an engine forward (deploy.engine /
    deploy.swin_engine builders — pure closures over frozen weights)
    with the batch sharded over the ``data`` axis. GSPMD replicates the
    closure's weight constants onto every chip and runs each shard's
    examples locally — per-example integer compute is untouched, so the
    sharded logits are bit-identical to single-device execution (the
    serving-scale analogue of the reference's single-GPU-only TVM path,
    /root/reference/TVM_benchmark/build_model.py:59-60).

    The global batch must be divisible by ``mesh.shape['data']``.
    """
    sh = NamedSharding(mesh, P("data"))
    return jax.jit(infer_fn, in_shardings=sh, out_shardings=sh)


def param_shardings(tree, mesh: Mesh):
    """Pytree of NamedShardings for a parameter/state pytree.

    With ``model=1`` everything is replicated (pure DP); with a wider
    model axis the transformer kernels are tensor-parallel per
    ``_PARAM_RULES``.
    """
    model_size = mesh.shape["model"]
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]

    def _path_str(path) -> str:
        parts = []
        for e in path:
            if hasattr(e, "key"):
                parts.append(str(e.key))
            elif hasattr(e, "name"):
                parts.append(str(e.name))
            elif hasattr(e, "idx"):
                parts.append(str(e.idx))
        return "/".join(parts)

    def shard_one(path, leaf):
        p = _path_str(path)
        return NamedSharding(mesh, _spec_for(p, getattr(leaf, "ndim", 0), model_size))

    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(tree),
        [shard_one(path, leaf) for path, leaf in flat],
    )
