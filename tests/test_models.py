"""End-to-end model tests on tiny configs (SURVEY.md §4d).

CPU-runnable: tiny ViT forward shapes, scale propagation, determinism in
eval mode, and gradient flow through the full integer pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ivit_tpu.models import VisionTransformer, create_model


def tiny_vit(**kw):
    return VisionTransformer(
        img_size=32,
        patch_size=8,
        num_classes=10,
        embed_dim=32,
        depth=2,
        num_heads=4,
        **kw,
    )


class TestVisionTransformer:
    def test_forward_shapes(self):
        m = tiny_vit()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(1), x, train=True)
        logits = m.apply(variables, x)
        assert logits.shape == (2, 10)
        assert jnp.all(jnp.isfinite(logits))

    def test_eval_deterministic(self):
        m = tiny_vit()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(1), x, train=True)
        l1 = m.apply(variables, x)
        l2 = m.apply(variables, x)
        np.testing.assert_array_equal(np.array(l1), np.array(l2))

    def test_train_updates_quant_stats(self):
        m = tiny_vit()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(1), x, train=True)
        _, new_vars = m.apply(
            variables, x * 2.0, train=True, mutable=["quant_stats"]
        )
        old = jax.tree_util.tree_leaves(variables["quant_stats"])
        new = jax.tree_util.tree_leaves(new_vars["quant_stats"])
        moved = sum(
            1 for a, b in zip(old, new) if float(jnp.abs(a - b).max()) > 0
        )
        assert moved > 0

    def test_grad_flows_to_head_and_embedding(self):
        m = tiny_vit()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(1), x, train=True)

        def loss_fn(params):
            logits = m.apply({**variables, "params": params}, x)
            return jnp.mean(logits**2)

        grads = jax.grad(loss_fn)(variables["params"])
        assert float(jnp.abs(grads["head"]["kernel"]).max()) > 0
        assert float(jnp.abs(grads["patch_embed"]["proj"]["kernel"]).max()) > 0
        assert float(jnp.abs(grads["cls_token"]).max()) >= 0  # exists
        assert float(jnp.abs(grads["pos_embed"]).max()) > 0

    def test_registry(self):
        m = create_model("deit_tiny")
        assert m.embed_dim == 192 and m.depth == 12 and m.num_heads == 3
        m = create_model("vit_large")
        assert m.embed_dim == 1024 and m.depth == 24 and m.num_heads == 16

    def test_jit_forward(self):
        m = tiny_vit()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(1), x, train=True)
        fwd = jax.jit(lambda v, x: m.apply(v, x))
        logits = fwd(variables, x)
        np.testing.assert_allclose(
            np.array(logits), np.array(m.apply(variables, x)), rtol=1e-5, atol=1e-5
        )
