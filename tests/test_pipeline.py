"""Pipeline-parallel (GPipe) trunk tests on the virtual 8-device CPU mesh.

The claims pinned here:
* stacked-variable layout round-trips exactly;
* the pipelined forward is BIT-identical to ``model.apply`` (integer
  dots are exactly associative, so microbatching cannot change values);
* gradients through the backward pipeline match sequential full-batch
  gradients;
* the pipelined train step learns on a (data × pipe) mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ivit_tpu.models import VisionTransformer
from ivit_tpu.parallel.pipeline import (
    from_pp_variables,
    make_pp_mesh,
    make_pp_train_step,
    pipeline_vit_forward,
    pp_shardings,
    to_pp_variables,
)


def small_model(depth=4):
    return VisionTransformer(
        img_size=16, patch_size=8, num_classes=8,
        embed_dim=32, depth=depth, num_heads=4,
    )


def calibrated(model, rng, images):
    """init + one stats-updating batch, so ranges are realistic."""
    variables = model.init(rng, images[:1], train=False)
    _, upd = model.apply(
        variables, images, train=True, mutable=["quant_stats"],
        rngs={"dropout": rng},
    )
    return {"params": variables["params"], "quant_stats": upd["quant_stats"]}


@pytest.fixture(scope="module")
def setup():
    model = small_model()
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
    variables = calibrated(model, rng, images)
    return model, variables, images


class TestStackedLayout:
    def test_round_trip_exact(self, setup):
        model, variables, _ = setup
        pp = to_pp_variables(variables, model.depth)
        back = from_pp_variables(pp, model.depth)
        jax.tree.map(
            np.testing.assert_array_equal, variables, back
        )

    def test_blocks_leading_axis(self, setup):
        model, variables, _ = setup
        pp = to_pp_variables(variables, model.depth)
        for leaf in jax.tree.leaves(pp["params"]["blocks"]):
            assert leaf.shape[0] == model.depth


class TestPipelineForward:
    @pytest.mark.parametrize("data,pipe,n_micro", [(2, 4, 4), (4, 2, 2)])
    def test_bit_identical_to_sequential(self, setup, data, pipe, n_micro):
        model, variables, images = setup
        seq = np.asarray(model.apply(variables, images, train=False))

        mesh = make_pp_mesh(data=data, pipe=pipe)
        pp_vars = to_pp_variables(variables, model.depth)
        pp_vars = jax.device_put(pp_vars, pp_shardings(pp_vars, mesh))

        fwd = jax.jit(
            lambda v, x: pipeline_vit_forward(model, v, x, mesh, n_micro)
        )
        out = np.asarray(fwd(pp_vars, images))
        np.testing.assert_array_equal(seq, out)

    def test_single_stage_degenerate(self, setup):
        model, variables, images = setup
        seq = np.asarray(model.apply(variables, images, train=False))
        mesh = make_pp_mesh(data=2, pipe=1, devices=jax.devices()[:2])
        pp_vars = to_pp_variables(variables, model.depth)
        out = np.asarray(
            jax.jit(
                lambda v, x: pipeline_vit_forward(model, v, x, mesh, 2)
            )(pp_vars, images)
        )
        np.testing.assert_array_equal(seq, out)

    def test_rejects_indivisible(self, setup):
        model, variables, images = setup
        mesh = make_pp_mesh(data=2, pipe=4)
        pp_vars = to_pp_variables(variables, model.depth)
        with pytest.raises(ValueError):
            pipeline_vit_forward(model, pp_vars, images, mesh, n_micro=3)


class TestPipelineBackward:
    def test_grads_match_sequential(self, setup):
        model, variables, images = setup
        targets = jax.nn.one_hot(
            jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 8), 8
        )

        def seq_loss(params):
            logits = model.apply(
                {"params": params, "quant_stats": variables["quant_stats"]},
                images, train=False,
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.sum(targets * logp, axis=-1))

        seq_grads = jax.grad(seq_loss)(variables["params"])

        mesh = make_pp_mesh(data=2, pipe=4)
        pp_vars = to_pp_variables(variables, model.depth)

        def pp_loss(params):
            logits = pipeline_vit_forward(
                model,
                {"params": params, "quant_stats": pp_vars["quant_stats"]},
                images, mesh, n_micro=4,
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.sum(targets * logp, axis=-1))

        pp_grads = jax.jit(jax.grad(pp_loss))(pp_vars["params"])
        pp_grads_unstacked = from_pp_variables(
            {"params": pp_grads, "quant_stats": pp_vars["quant_stats"]},
            model.depth,
        )["params"]

        flat_seq = jax.tree_util.tree_flatten_with_path(seq_grads)[0]
        flat_pp = jax.tree_util.tree_flatten_with_path(pp_grads_unstacked)[0]
        assert len(flat_seq) == len(flat_pp)
        for (path_s, g_s), (path_p, g_p) in zip(flat_seq, flat_pp):
            assert path_s == path_p
            np.testing.assert_allclose(
                np.asarray(g_s), np.asarray(g_p),
                rtol=2e-5, atol=1e-6,
                err_msg=jax.tree_util.keystr(path_s),
            )


class TestPipelineTrainStep:
    @pytest.mark.slow
    def test_loss_decreases_on_mesh(self, setup):
        model, variables, images = setup
        targets = jax.nn.one_hot(
            jax.random.randint(jax.random.PRNGKey(3), (8,), 0, 8), 8
        )
        mesh = make_pp_mesh(data=2, pipe=4)
        pp_vars = to_pp_variables(variables, model.depth)
        shardings = pp_shardings(pp_vars, mesh)
        pp_vars = jax.device_put(pp_vars, shardings)

        tx = optax.adamw(5e-3)
        opt_state = tx.init(pp_vars["params"])
        step = jax.jit(make_pp_train_step(model, mesh, n_micro=4, tx=tx,
                                          grad_clip=1.0))

        params = pp_vars["params"]
        losses = []
        for _ in range(8):
            params, opt_state, _, metrics = step(
                params, pp_vars["quant_stats"], opt_state, None,
                images, targets,
            )
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0], losses

    def test_param_placement_survives_step(self, setup):
        model, variables, images = setup
        targets = jax.nn.one_hot(jnp.zeros((8,), jnp.int32), 8)
        mesh = make_pp_mesh(data=2, pipe=4)
        pp_vars = to_pp_variables(variables, model.depth)
        pp_vars = jax.device_put(pp_vars, pp_shardings(pp_vars, mesh))
        tx = optax.adamw(1e-3)
        opt_state = tx.init(pp_vars["params"])
        step = jax.jit(make_pp_train_step(model, mesh, n_micro=4, tx=tx))
        params, _, _, _ = step(
            pp_vars["params"], pp_vars["quant_stats"], opt_state, None,
            images, targets,
        )
        # Stage params keep their P('pipe') sharding after the update —
        # optimizer math stayed stage-local.
        for leaf in jax.tree.leaves(params["blocks"]):
            spec = leaf.sharding.spec
            assert spec and spec[0] == "pipe", spec
