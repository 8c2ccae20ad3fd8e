"""GPipe-style pipeline parallelism over the ViT block trunk.

The reference has no pipeline story at all (its DDP plumbing is dormant,
/root/reference/utils/utils.py:215-237); this module adds the third mesh
dimension the TPU platform expects for models past single-chip scale:
``(data, pipe)`` — batch parallelism times depth partitioning.

Design (the "How to Scale Your Model" collective-pipelining recipe,
expressed with ``shard_map`` + ``ppermute``):

* The transformer trunk is a stack of structurally identical ``Block``
  modules, so the per-block parameter/quant-stat subtrees stack into
  arrays with a leading ``depth`` axis. Sharding that axis over the
  ``pipe`` mesh axis places ``depth/S`` blocks per stage — true
  parameter placement, not replication.
* Each stage runs its blocks with ``lax.scan`` over its slice of the
  stacked tree; activations (integer carrier + scale, i.e. the QTensor
  pytree) hop stage→stage with ``lax.ppermute`` on the ``pipe`` axis.
* The schedule is plain GPipe: ``n_micro`` microbatches, ``n_micro+S-1``
  ticks, bubbles idle-compute on garbage (standard). Reverse-mode AD
  differentiates straight through ``scan``+``ppermute``, so the same
  forward powers the pipelined training step.
* The prologue (patch embed / cls / pos merge) and epilogue (final
  I-LayerNorm / head) run unpipelined on the full batch — they are a
  few percent of the FLOPs. Their wiring mirrors
  ``VisionTransformer.__call__`` (models/vit.py:59-134) line for line;
  tests/test_pipeline.py pins bit-equality against ``model.apply`` so
  any drift between the two fails loudly.

Semantics: the pipeline runs the model in FROZEN-RANGE mode (the
reference's ``freeze_model``, /root/reference/models/model_utils.py:5-40)
— EMA range updates are inherently sequential-batch semantics and are
the non-pipelined step's job. Per-example integer compute is unchanged,
so pipelined logits are bit-identical to single-device eval.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

from ..core.qtensor import QTensor
from ..nn.quant import IntLayerNorm, QuantAct, QuantLinear, QuantPatchEmbed
from ..nn.vit_blocks import Block


def make_pp_mesh(data: int = 1, pipe: int = 2, devices=None) -> Mesh:
    """A ``(data, pipe)`` mesh: batch parallelism × depth partitioning."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data * pipe != n:
        raise ValueError(f"mesh {data}x{pipe} != {n} devices")
    return Mesh(np.asarray(devices).reshape(data, pipe), ("data", "pipe"))


# ---------------------------------------------------------------------------
# Stacked-block variable layout.
# ---------------------------------------------------------------------------


def stack_blocks(tree, depth: int):
    """Restack one column tree's ``blocks_0..blocks_{d-1}`` subtrees into
    a single ``blocks`` subtree with a leading ``depth`` axis (shardable
    ``P('pipe')``). Inverse of :func:`unstack_blocks`; round-trip exact."""
    rest = {k: v for k, v in tree.items() if not k.startswith("blocks_")}
    per_block = [tree[f"blocks_{i}"] for i in range(depth)]
    rest["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *per_block)
    return rest


def unstack_blocks(tree, depth: int):
    """Unstack a ``blocks`` subtree back into ``blocks_i`` keys."""
    rest = {k: v for k, v in tree.items() if k != "blocks"}
    for i in range(depth):
        rest[f"blocks_{i}"] = jax.tree.map(
            lambda a, i=i: a[i], tree["blocks"]
        )
    return rest


def to_pp_variables(variables, depth: int):
    """Restack both variable columns (params, quant_stats) into the
    stacked-``blocks`` layout. Checkpoints written by either layout
    interconvert losslessly (round-trip is exact)."""
    return {
        col: stack_blocks(variables[col], depth)
        for col in ("params", "quant_stats")
    }


def from_pp_variables(pp_vars, depth: int):
    """Unstack both variable columns back into ``blocks_i`` keys."""
    return {
        col: unstack_blocks(pp_vars[col], depth)
        for col in ("params", "quant_stats")
    }


def pp_tree_shardings(tree, mesh: Mesh):
    """NamedShardings for ONE stacked-layout tree: ``blocks`` leaves
    partitioned over ``pipe`` on the stacked depth axis (true per-stage
    placement); the small prologue / epilogue subtrees replicated."""
    rest = {
        k: jax.tree.map(lambda _: NamedSharding(mesh, P()), v)
        for k, v in tree.items()
        if k != "blocks"
    }
    rest["blocks"] = jax.tree.map(
        lambda _: NamedSharding(mesh, P("pipe")), tree["blocks"]
    )
    return rest


def pp_shardings(pp_vars, mesh: Mesh):
    """NamedShardings for both stacked variable columns."""
    return {
        col: pp_tree_shardings(pp_vars[col], mesh)
        for col in ("params", "quant_stats")
    }


def vit_block(model) -> Block:
    """A trunk Block configured like ``model``'s (deterministic mode)."""
    return Block(
        dim=model.embed_dim,
        num_heads=model.num_heads,
        mlp_ratio=model.mlp_ratio,
        qkv_bias=model.qkv_bias,
        softmax_bits=model.softmax_bits,
        gelu_stable=model.gelu_stable,
        interp=model.interp,
    )


# ---------------------------------------------------------------------------
# Unpipelined prologue / epilogue (mirror models/vit.py:59-134; bit-equality
# vs model.apply is pinned by tests/test_pipeline.py).
# ---------------------------------------------------------------------------


def _sub(variables, name):
    cols = {}
    for col in ("params", "quant_stats"):
        if name in variables.get(col, {}):
            cols[col] = variables[col][name]
    return cols


def vit_prologue(model, variables, images) -> QTensor:
    """input qact → patch embed → qact → cls concat → pos merge
    (models/vit.py:59-101, eval mode)."""
    it = model.interp
    p = variables["params"]
    B = images.shape[0]

    def qact(name, bits, x, identity=None):
        return QuantAct(bits, interp=it).apply(
            _sub(variables, name), x, identity=identity
        )

    x = qact("qact_input", 8, images)
    x = QuantPatchEmbed(
        patch_size=model.patch_size, features=model.embed_dim, interp=it
    ).apply(_sub(variables, "patch_embed"), x)
    x = qact("qact_embed", 16, x)

    cls_q = it.round(p["cls_token"] / jax.lax.stop_gradient(x.scale))
    cls_q = jnp.broadcast_to(cls_q, (B, 1, model.embed_dim))
    x = x.replace(q=jnp.concatenate([cls_q, x.q], axis=1))

    pos = qact("qact_pos", 16, p["pos_embed"])
    x = qact(
        "qact1", 16, x, identity=pos.replace(q=jnp.broadcast_to(pos.q, x.shape))
    )
    return x


def vit_epilogue(model, variables, x: QTensor) -> jax.Array:
    """final I-LayerNorm → CLS select → qact → head (models/vit.py:130-134)."""
    it = model.interp
    x = IntLayerNorm(model.embed_dim, interp=it).apply(_sub(variables, "norm"), x)
    x = x.replace(q=x.q[:, 0])
    x = QuantAct(8, interp=it).apply(_sub(variables, "qact2"), x)
    logits = QuantLinear(model.num_classes, interp=it).apply(
        _sub(variables, "head"), x
    )
    return logits.dequantize()


# ---------------------------------------------------------------------------
# The GPipe trunk.
# ---------------------------------------------------------------------------


def pipeline_trunk(
    block: Block,
    stacked_params,
    stacked_stats,
    x: QTensor,
    mesh: Mesh,
    n_micro: int,
) -> QTensor:
    """Run the stacked trunk over mesh axis ``pipe``, GPipe schedule.

    ``stacked_params`` / ``stacked_stats``: per-block trees with leading
    ``depth`` axis. ``x``: the full-batch trunk input (16-bit QTensor from
    qact1). Microbatch ``m``'s result leaves stage ``S-1`` at tick
    ``m+S-1``; outputs are re-assembled to the full batch.
    """
    S = mesh.shape["pipe"]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    if depth % S:
        raise ValueError(f"depth {depth} not divisible by {S} stages")
    L = depth // S
    B = x.q.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by {n_micro} microbatches")
    mB = B // n_micro
    T = n_micro + S - 1
    bits = x.bits

    # (depth, ...) -> (S, L, ...): stage-major so P('pipe') lands L
    # consecutive blocks per stage.
    p_st = jax.tree.map(
        lambda a: a.reshape((S, L) + a.shape[1:]), stacked_params
    )
    s_st = jax.tree.map(lambda a: a.reshape((S, L) + a.shape[1:]), stacked_stats)

    xq = x.q.reshape((n_micro, mB) + x.q.shape[1:])
    xs = jnp.broadcast_to(x.scale, (n_micro,))

    def gpipe(p_loc, s_loc, xq, xs):
        # p_loc/s_loc arrive (1, L, ...): this stage's blocks.
        p_loc = jax.tree.map(lambda a: a[0], p_loc)
        s_loc = jax.tree.map(lambda a: a[0], s_loc)
        sidx = jax.lax.axis_index("pipe")

        def run_stage(q, scale):
            def body(carry, ps):
                bp, bs = ps
                out = block.apply(
                    {"params": bp, "quant_stats": bs},
                    QTensor(q=carry[0], scale=carry[1], bits=bits),
                )
                return (out.q, out.scale), None

            (q, scale), _ = jax.lax.scan(body, (q, scale), (p_loc, s_loc))
            return q, scale

        def tick(carry, t):
            held_q, held_s = carry  # what the previous stage sent last tick
            m = jnp.clip(t, 0, n_micro - 1)
            in_q = jnp.where(sidx == 0, xq[m], held_q)
            in_s = jnp.where(sidx == 0, xs[m], held_s)
            out_q, out_s = run_stage(in_q, in_s)
            perm = [(i, (i + 1) % S) for i in range(S)]
            nxt_q = jax.lax.ppermute(out_q, "pipe", perm)
            nxt_s = jax.lax.ppermute(out_s, "pipe", perm)
            return (nxt_q, nxt_s), (out_q, out_s)

        init = (jnp.zeros_like(xq[0]), jnp.zeros_like(xs[0]))
        _, (ys_q, ys_s) = jax.lax.scan(tick, init, jnp.arange(T))
        return ys_q, ys_s

    data_in = "data" if "data" in mesh.axis_names else None
    ys_q, ys_s = _shard_map(
        gpipe,
        mesh=mesh,
        in_specs=(P("pipe"), P("pipe"), P(None, data_in), P()),
        out_specs=(P("pipe", data_in), P("pipe")),
        check_vma=False,
    )(p_st, s_st, xq, xs)

    # Stage S-1's outputs occupy rows [(S-1)*T, S*T); microbatch m's is
    # row (S-1)*T + (S-1) + m.
    start = (S - 1) * T + (S - 1)
    out_q = ys_q[start : start + n_micro]
    out_q = out_q.reshape((B,) + out_q.shape[2:])
    # Frozen ranges make every microbatch's output scale identical; take
    # the first.
    return QTensor(q=out_q, scale=ys_s[start], bits=16)


def pipeline_vit_forward(
    model, pp_vars, images, mesh: Mesh, n_micro: int
) -> jax.Array:
    """Full pipelined forward on stacked variables → float logits.

    Bit-identical to ``model.apply(variables, images, train=False)``
    (pinned by tests/test_pipeline.py)."""
    x = vit_prologue(model, pp_vars, images)
    x = pipeline_trunk(
        vit_block(model),
        pp_vars["params"]["blocks"],
        pp_vars["quant_stats"]["blocks"],
        x,
        mesh,
        n_micro,
    )
    return vit_epilogue(model, pp_vars, x)


def make_pp_train_step(
    model,
    mesh: Mesh,
    n_micro: int,
    tx,
    grad_clip: Optional[float] = None,
    ema_decay: float = 0.0,
):
    """Pipelined training step on stacked variables.

    Frozen-range finetune semantics (see module docstring): forward is
    the pipelined graph above, loss is soft-target CE on the caller's
    (possibly mixup) soft targets — the same contract as
    ``train.steps.make_train_step`` — and reverse-mode AD runs the
    backward pipeline through the same ``scan``+``ppermute`` schedule.
    Stage parameters stay sharded ``P('pipe')`` end-to-end — gradients,
    optimizer state, and the EMA copy inherit the placement, so
    optimizer math is local to each stage (no gather of the full model
    anywhere).

    Signature: ``(params, quant_stats, opt_state, ema_params, images,
    targets) → (params, opt_state, ema_params, metrics)`` with
    ``metrics = {'loss', 'acc1'}`` — matching the non-pipelined step's
    surface so ``quant_train --pipe`` reuses the same loop. Pass
    ``ema_params=None`` when EMA is off.
    """
    from ..train.losses import topk_accuracy

    def step(params, quant_stats, opt_state, ema_params, images, targets):
        def loss_fn(p):
            logits = pipeline_vit_forward(
                model,
                {"params": p, "quant_stats": quant_stats},
                images,
                mesh,
                n_micro,
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.sum(targets * logp, axis=-1)), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_params is not None:
            ema_params = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                ema_params,
                params,
            )
        metrics = {
            "loss": loss,
            "acc1": topk_accuracy(logits, jnp.argmax(targets, -1), 1),
        }
        return params, opt_state, ema_params, metrics

    return step
