"""ZeRO-1-style optimizer/EMA sharding (`parallel.mesh.zero1_shardings`).

The AdamW moments and the EMA copy are partitioned over the data axis;
the step's math must be unchanged vs the fully replicated layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ivit_tpu.models import VisionTransformer
from ivit_tpu.parallel import (
    data_sharding,
    make_mesh,
    param_shardings,
    zero1_shardings,
)
from ivit_tpu.train import create_train_state, make_train_step


def tiny_model():
    return VisionTransformer(
        img_size=16, patch_size=8, num_classes=8,
        embed_dim=32, depth=1, num_heads=4,
    )


class TestZero1:
    def test_moments_are_sharded(self):
        mesh = make_mesh(data=8, model=1)
        model = tiny_model()
        rng = jax.random.PRNGKey(0)
        images = jax.random.normal(rng, (8, 16, 16, 3))
        state = create_train_state(
            model, rng, images[:1], optax.adamw(1e-3), ema_decay=0.99
        )
        sh = zero1_shardings(state, mesh)
        # At least the big kernel moments must be partitioned over data.
        specs = [
            s.spec
            for s in jax.tree.leaves(sh.opt_state)
            if isinstance(s, jax.sharding.NamedSharding)
        ]
        assert any("data" in (ax for ax in spec if ax) for spec in specs)
        ema_specs = [s.spec for s in jax.tree.leaves(sh.ema_params)]
        assert any("data" in (ax for ax in spec if ax) for spec in ema_specs)
        # Params themselves follow the TP rules (replicated at model=1).
        for s in jax.tree.leaves(sh.params):
            assert s.spec == jax.sharding.PartitionSpec()

    def test_composes_with_tp(self):
        # On a (data, model) mesh the moments must keep the TP spec they
        # inherit from param_shardings AND gain the data axis — a
        # data-only respec would cap the per-chip saving at the DP
        # degree alone (regression: the original implementation replaced
        # the spec, losing the model-axis partition).
        mesh = make_mesh(data=4, model=2)
        model = tiny_model()
        rng = jax.random.PRNGKey(0)
        images = jax.random.normal(rng, (8, 16, 16, 3))
        state = create_train_state(
            model, rng, images[:1], optax.adamw(1e-3), ema_decay=0.99
        )
        sh = zero1_shardings(state, mesh)
        base = param_shardings(state, mesh)
        both = 0
        for s, b in zip(
            jax.tree.leaves(sh.opt_state), jax.tree.leaves(base.opt_state)
        ):
            axes = {ax for ax in s.spec if ax}
            if "model" in {ax for ax in b.spec if ax}:
                # TP-sharded moment: the spec must keep 'model'.
                assert "model" in axes, (b.spec, s.spec)
            if axes >= {"data", "model"}:
                both += 1
        assert both > 0  # at least the big kernel moments carry both

    def test_step_matches_replicated(self):
        model = tiny_model()
        rng = jax.random.PRNGKey(0)
        images = jax.random.normal(rng, (16, 16, 16, 3))
        targets = jax.nn.one_hot(jax.random.randint(rng, (16,), 0, 8), 8)
        tx = optax.adamw(1e-3)
        state = create_train_state(
            model, rng, images[:1], tx, ema_decay=0.99
        )
        step = jax.jit(make_train_step(model, ema_decay=0.99))
        srng = jax.random.PRNGKey(7)

        s_rep, m_rep = step(state, images, targets, srng)

        mesh = make_mesh(data=8, model=1)
        s_z1, m_z1 = step(
            jax.device_put(state, zero1_shardings(state, mesh)),
            jax.device_put(images, data_sharding(mesh)),
            jax.device_put(targets, data_sharding(mesh)),
            srng,
        )
        np.testing.assert_allclose(
            float(m_z1["loss"]), float(m_rep["loss"]), rtol=1e-5
        )
        # Same tolerance rationale as the DP-equivalence test: AdamW's
        # first step amplifies f32 gradient-reduction-order dust.
        for a, b in zip(
            jax.tree.leaves(s_rep.params), jax.tree.leaves(s_z1.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5
            )
        for a, b in zip(
            jax.tree.leaves(s_rep.ema_params),
            jax.tree.leaves(s_z1.ema_params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5
            )
