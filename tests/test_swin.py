"""Swin model tests: windowing round-trips, mask structure, tiny
end-to-end forward + gradient."""

import jax
import jax.numpy as jnp
import numpy as np

from ivit_tpu.models import SwinTransformer, create_model
from ivit_tpu.models.swin import (
    relative_position_index,
    sw_attn_mask,
    window_partition,
    window_reverse,
)


class TestWindowing:
    def test_partition_reverse_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 5))
        w = window_partition(x, 4)
        assert w.shape == (2 * 4, 16, 5)
        back = window_reverse(w, 4, 8, 8)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_relative_position_index(self):
        idx = relative_position_index(7)
        assert idx.shape == (49, 49)
        assert idx.min() >= 0 and idx.max() < 13 * 13
        # symmetry: index(i,j) at mirrored offsets
        assert idx[0, 0] == idx[10, 10]

    def test_sw_mask(self):
        m = sw_attn_mask(8, 8, 4, 2)
        assert m.shape == (4, 16, 16)
        assert set(np.unique(m)) <= {0.0, -100.0}
        assert sw_attn_mask(8, 8, 4, 0) is None
        # diagonal is always visible
        for w in range(4):
            np.testing.assert_array_equal(np.diag(m[w]), 0.0)


def tiny_swin():
    return SwinTransformer(
        img_size=16,
        patch_size=2,
        num_classes=8,
        embed_dim=16,
        depths=(1, 1),
        num_heads=(2, 4),
        window_size=4,
        drop_path_rate=0.0,
    )


class TestSwinModel:
    def test_forward_and_stats(self):
        m = tiny_swin()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
        variables = m.init(jax.random.PRNGKey(1), x, train=True)
        logits = m.apply(variables, x)
        assert logits.shape == (2, 8)
        assert np.isfinite(np.asarray(logits)).all()
        # shifted block exists in stage 0? depths are 1 so no shift; check
        # a two-block stage also runs with SW-MSA.
        m2 = SwinTransformer(
            img_size=16, patch_size=2, num_classes=8, embed_dim=16,
            depths=(2,), num_heads=(2,), window_size=4, drop_path_rate=0.0,
        )
        v2 = m2.init(jax.random.PRNGKey(1), x, train=True)
        logits2 = m2.apply(v2, x)
        assert np.isfinite(np.asarray(logits2)).all()

    def test_grad_flows(self):
        m = tiny_swin()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
        variables = m.init(jax.random.PRNGKey(1), x, train=True)

        def loss_fn(params):
            return jnp.mean(
                m.apply({**variables, "params": params}, x) ** 2
            )

        grads = jax.grad(loss_fn)(variables["params"])
        table = grads["layers_0_blocks_0"]["attn"][
            "relative_position_bias_table"
        ]
        assert float(jnp.abs(table).max()) > 0
        assert float(jnp.abs(grads["head"]["kernel"]).max()) > 0
        pm = grads["layers_0_downsample"]["reduction"]["kernel"]
        assert float(jnp.abs(pm).max()) > 0

    def test_registry_configs(self):
        m = create_model("swin_tiny")
        assert m.embed_dim == 96 and tuple(m.depths) == (2, 2, 6, 2)
        m = create_model("swin_base")
        assert m.embed_dim == 128 and tuple(m.num_heads) == (4, 8, 16, 32)
