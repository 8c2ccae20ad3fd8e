"""Sequence-parallel (sp) activation sharding on the virtual CPU mesh.

``parallel.mesh.seq_constraint`` shards the token axis of block-boundary
activations over the SAME mesh axis as the TP kernels (Megatron-SP).
Every op between matmuls is per-token, so the rewrite must be
value-identical — pinned here against the unconstrained forward, under
both pure-DP and DP×TP parameter layouts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ivit_tpu.models import VisionTransformer
from ivit_tpu.parallel import (
    data_sharding,
    make_mesh,
    param_shardings,
    seq_constraint,
)
from ivit_tpu.train import create_train_state, make_train_step


def models(mesh):
    kw = dict(
        img_size=16, patch_size=4, num_classes=8,
        embed_dim=32, depth=2, num_heads=4,
    )
    return (
        VisionTransformer(**kw),
        VisionTransformer(**kw, act_constraint=seq_constraint(mesh)),
    )


class TestSequenceParallel:
    def test_forward_value_identical(self):
        mesh = make_mesh(data=2, model=4)
        base, sp = models(mesh)
        rng = jax.random.PRNGKey(0)
        images = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
        variables = base.init(rng, images[:1], train=False)

        ref = np.asarray(
            jax.jit(lambda v, x: base.apply(v, x, train=False))(
                variables, images
            )
        )
        got = np.asarray(
            jax.jit(lambda v, x: sp.apply(v, x, train=False))(
                jax.device_put(variables, param_shardings(variables, mesh)),
                jax.device_put(images, data_sharding(mesh)),
            )
        )
        # Integer carriers + order-independent reductions: bit-exact.
        np.testing.assert_array_equal(ref, got)

    def test_train_step_on_tp_mesh(self):
        mesh = make_mesh(data=2, model=4)
        _, sp = models(mesh)
        rng = jax.random.PRNGKey(0)
        images = jax.random.normal(rng, (8, 16, 16, 3))
        targets = jax.nn.one_hot(
            jax.random.randint(rng, (8,), 0, 8), 8
        )
        tx = optax.adamw(1e-3)
        state = create_train_state(sp, rng, images[:1], tx)
        state = jax.device_put(state, param_shardings(state, mesh))
        step = jax.jit(make_train_step(sp))
        new_state, metrics = step(
            state,
            jax.device_put(images, data_sharding(mesh)),
            jax.device_put(targets, data_sharding(mesh)),
            rng,
        )
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1
