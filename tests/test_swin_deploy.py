"""Swin sim ↔ int8 deploy engine consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.deploy.swin_engine import build_swin_infer, freeze_swin
from ivit_tpu.models import SwinTransformer


def trained_tiny_swin(steps=3):
    model = SwinTransformer(
        img_size=16, patch_size=2, num_classes=8, embed_dim=16,
        depths=(2, 2), num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x, train=True)
    for i in range(steps):
        xi = jax.random.normal(jax.random.PRNGKey(10 + i), (2, 16, 16, 3))
        _, upd = model.apply(variables, xi, train=True, mutable=["quant_stats"])
        variables = {"params": variables["params"], **upd}
    return model, variables


class TestSwinDeploy:
    @pytest.mark.slow
    def test_sim_deploy_logits_match(self):
        model, variables = trained_tiny_swin()
        x = jax.random.normal(jax.random.PRNGKey(42), (2, 16, 16, 3))

        sim = np.asarray(model.apply(variables, x, train=False))
        artifact = freeze_swin(model, jax.tree.map(np.asarray, variables))
        dep = np.asarray(
            jax.jit(build_swin_infer(artifact, use_pallas=False))(x)
        )

        assert dep.shape == sim.shape
        head_scale = float(np.max(artifact["head"]["out_scale"]))
        np.testing.assert_allclose(dep, sim, atol=4 * head_scale, rtol=0)
        np.testing.assert_array_equal(np.argmax(dep, -1), np.argmax(sim, -1))

    def test_shifted_window_block_covered(self):
        """The artifact includes a shifted block with a mask addend."""
        model, variables = trained_tiny_swin()
        artifact = freeze_swin(model, jax.tree.map(np.asarray, variables))
        shifts = [
            b["shift"] for st in artifact["stages"] for b in st["blocks"]
        ]
        assert any(s > 0 for s in shifts)
        masked = [
            b["mask_int"] is not None
            for st in artifact["stages"]
            for b in st["blocks"]
            if b["shift"] > 0
        ]
        assert all(masked)


class TestSwinPallasAttention:
    @pytest.mark.slow
    def test_fused_window_attention_bit_matches_pure(self):
        """pallas_ops=("attention",) ≡ the pure-XLA engine, interpret
        mode — covers masked (shifted) AND unmasked window blocks."""
        model, variables = trained_tiny_swin()
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 3))
        artifact = freeze_swin(model, jax.tree.map(np.asarray, variables))
        pure = np.asarray(build_swin_infer(artifact, use_pallas=False)(x))
        fused = np.asarray(build_swin_infer(
            artifact, use_pallas=True, pallas_interpret=True,
            pallas_ops=("attention",),
        )(x))
        np.testing.assert_array_equal(fused, pure)


class TestSwinGeluStable:
    def test_sim_deploy_parity_gelu_stable(self):
        model = SwinTransformer(
            img_size=16, patch_size=2, num_classes=8, embed_dim=16,
            depths=(2, 2), num_heads=(2, 4), window_size=4,
            drop_path_rate=0.0, gelu_stable=True,
        )
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=True)
        _, upd = model.apply(
            variables, x, train=True, mutable=["quant_stats"]
        )
        variables = {"params": variables["params"], **upd}
        sim = np.asarray(model.apply(variables, x, train=False))
        artifact = freeze_swin(model, jax.tree.map(np.asarray, variables))
        assert artifact["config"]["gelu_stable"] is True
        dep = np.asarray(
            jax.jit(build_swin_infer(artifact, use_pallas=False))(x)
        )
        head_scale = float(np.max(artifact["head"]["out_scale"]))
        np.testing.assert_allclose(dep, sim, atol=4 * head_scale, rtol=0)
        # int32-lane stable-GELU twin must be bit-identical to the
        # default engine path (ops-level proof in test_ops.py)
        dep_int = np.asarray(
            build_swin_infer(
                artifact, use_pallas=False, gelu_int_lanes=True
            )(x)
        )
        np.testing.assert_array_equal(dep_int, dep)
        # packed-u16 softmax boundary (unmasked windows only; masked
        # SW-MSA blocks fall back inside ops/shiftmax) — value-identical
        dep_pack = np.asarray(
            build_swin_infer(
                artifact, use_pallas=False, sm_packed=True
            )(x)
        )
        np.testing.assert_array_equal(dep_pack, dep)
        # bf16×bf16→f32 window dots (value-identical: int8 carriers are
        # bf16-exact and every partial sum stays below 2^24)
        dep_f32 = np.asarray(
            build_swin_infer(
                artifact, use_pallas=False, scores_f32=True
            )(x)
        )
        np.testing.assert_array_equal(dep_f32, dep)
        dep_both = np.asarray(
            build_swin_infer(
                artifact, use_pallas=False, scores_f32=True,
                sm_packed=True,
            )(x)
        )
        np.testing.assert_array_equal(dep_both, dep)
        # layout probes (VERDICT r3 item 3): head-major q/k/v carriers
        # and token-axis window padding (N=16 → 24 here; covers masked
        # shifted blocks and the col_valid shiftmax hook) — both must
        # be bit-identical to the default engine, alone and combined
        dep_hm = np.asarray(
            build_swin_infer(
                artifact, use_pallas=False, qkv_hmajor=True
            )(x)
        )
        np.testing.assert_array_equal(dep_hm, dep)
        dep_wp = np.asarray(
            build_swin_infer(artifact, use_pallas=False, win_pad=24)(x)
        )
        np.testing.assert_array_equal(dep_wp, dep)
        dep_hmwp = np.asarray(
            build_swin_infer(
                artifact, use_pallas=False, qkv_hmajor=True, win_pad=24
            )(x)
        )
        np.testing.assert_array_equal(dep_hmwp, dep)
        # round-5 spec-level probe: head-split fused INTO the qkv GEMM
        # (head-major (3,H,hd,Bw,N) straight out of the dot) — must be
        # bit-identical; this config covers masked shifted blocks too
        dep_wm = np.asarray(
            build_swin_infer(
                artifact, use_pallas=False, qkv_wmajor=True
            )(x)
        )
        np.testing.assert_array_equal(dep_wm, dep)
