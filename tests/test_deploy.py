"""QAT-sim ↔ deploy-engine consistency (SURVEY.md §4b).

The analogue of the reference's QAT↔TVM smoke test
(/root/reference/TVM_benchmark/evaluate_accuracy.py) — but automated and
quantitative: the frozen int8 engine must reproduce the simulator's
logits on the same inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.deploy import build_vit_infer, freeze_vit
from ivit_tpu.models import VisionTransformer


def trained_tiny(rng_seed=0, steps=3):
    """Init a tiny model and run a few stat-updating passes so the EMA
    ranges are realistic (non-degenerate) before freezing."""
    model = VisionTransformer(
        img_size=16, patch_size=8, num_classes=8,
        embed_dim=32, depth=2, num_heads=4,
    )
    rng = jax.random.PRNGKey(rng_seed)
    x = jax.random.normal(rng, (4, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x, train=True)
    for i in range(steps):
        xi = jax.random.normal(jax.random.PRNGKey(10 + i), (4, 16, 16, 3))
        _, upd = variables_apply = model.apply(
            variables, xi, train=True, mutable=["quant_stats"]
        )
        variables = {"params": variables["params"], **upd}
    return model, variables


class TestDeployParity:
    @pytest.mark.slow
    def test_sim_deploy_logits_match(self):
        model, variables = trained_tiny()
        x = jax.random.normal(jax.random.PRNGKey(42), (4, 16, 16, 3))

        sim_logits = np.asarray(model.apply(variables, x, train=False))

        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
        infer = jax.jit(build_vit_infer(artifact))
        dep_logits = np.asarray(infer(x))

        assert dep_logits.shape == sim_logits.shape
        # Bit-parity by construction up to 1-ulp ratio rounding; allow a
        # couple of LSBs of the head output scale.
        head_scale = float(np.max(artifact["head"]["out_scale"]))
        np.testing.assert_allclose(
            dep_logits, sim_logits, atol=3 * head_scale, rtol=0
        )
        np.testing.assert_array_equal(
            np.argmax(dep_logits, -1), np.argmax(sim_logits, -1)
        )

    def test_artifact_dtypes(self):
        model, variables = trained_tiny()
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
        assert artifact["patch_embed"]["w"].dtype == np.int8
        assert artifact["patch_embed"]["b"].dtype == np.int32
        for blk in artifact["blocks"]:
            assert blk["qkv"]["w"].dtype == np.int8
            assert blk["fc2"]["b"].dtype == np.int32
            assert blk["norm1"]["out_scale"].dtype == np.float32

    @pytest.mark.slow
    def test_pallas_engine_bit_matches_pure(self):
        """Pallas-fused engine ≡ pure-XLA engine (interpret mode on CPU).

        Uses a 128-wide model so every fused kernel is shape-eligible.
        """
        model = VisionTransformer(
            img_size=16, patch_size=8, num_classes=8,
            embed_dim=128, depth=1, num_heads=4,
        )
        rng = jax.random.PRNGKey(3)
        x = jax.random.normal(rng, (2, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(4), x, train=True)
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))

        all_ops = ("softmax", "gelu", "layernorm")
        pure = build_vit_infer(
            artifact, use_pallas=False, attn_v_mode="exact"
        )(x)
        fused = build_vit_infer(
            artifact, use_pallas=True, pallas_interpret=True,
            pallas_ops=all_ops, attn_v_mode="exact",
        )(x)
        np.testing.assert_array_equal(np.asarray(pure), np.asarray(fused))
        # and the f32 attn@V default agrees with the exact mode here
        f32mode = build_vit_infer(artifact, use_pallas=False)(x)
        np.testing.assert_array_equal(np.asarray(pure), np.asarray(f32mode))
        # fully-fused attention kernel is bit-identical to the exact mode
        fused_attn = build_vit_infer(
            artifact, use_pallas=True, pallas_interpret=True,
            pallas_ops=("attention",), attn_v_mode="exact",
        )(x)
        np.testing.assert_array_equal(np.asarray(pure), np.asarray(fused_attn))
        # batched fused attention v2 ≡ the default f32-@V XLA path
        # (identical chain + HIGH @V; exact f32 on CPU for both)
        fused_attn2 = build_vit_infer(
            artifact, use_pallas=True, pallas_interpret=True,
            pallas_ops=("attention2",),
        )(x)
        np.testing.assert_array_equal(
            np.asarray(f32mode), np.asarray(fused_attn2)
        )

    def test_deploy_deterministic(self):
        model, variables = trained_tiny()
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
        infer = jax.jit(build_vit_infer(artifact))
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 3))
        a = np.asarray(infer(x))
        b = np.asarray(infer(x))
        np.testing.assert_array_equal(a, b)


class TestEngineVariantMatrix:
    """Every engine perf knob is value-identical to the default path
    (they reorder or re-materialize, never change arithmetic)."""

    @pytest.mark.slow
    def test_flag_variants_bit_match_default(self):
        model = VisionTransformer(
            img_size=16, patch_size=8, num_classes=8,
            embed_dim=128, depth=1, num_heads=4,
        )
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(4), x, train=True)
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))

        base = np.asarray(
            build_vit_infer(artifact, use_pallas=False)(x)
        )
        variants = [
            {"sm_int16": True},
            {"sm_split": True},
            {"sm_packed": True},
            {"sm_int_lanes": True},
            {"proj_4d": True},
            {"res_split": True},
            {"sm_int16": True, "res_split": True},
            # composite coverage: the packed boundary must compose with
            # the other (orthogonal) softmax/residual knobs
            {"sm_packed": True, "sm_int16": True},
            {"sm_packed": True, "attn_v_mode": "exact"},
            {"sm_packed": True, "res_split": True},
        ]
        for kw in variants:
            out = np.asarray(
                build_vit_infer(artifact, use_pallas=False, **kw)(x)
            )
            np.testing.assert_array_equal(out, base, err_msg=str(kw))

    def test_sm_packed_excludes_sm_split(self):
        # alternative pass-boundary strategies: refuse at build entry
        # (before the artifact is touched), not with a mid-trace assert
        with pytest.raises(ValueError, match="sm_packed"):
            build_vit_infer({}, sm_split=True, sm_packed=True)

    @pytest.mark.slow
    def test_long_sequence_kernel_gate_falls_back_bit_equal(self):
        """n_tokens > 256 exceeds the Pallas kernels' 2-limb exact-row-
        sum bound: every kernel knob must warn, disable, and produce
        the XLA path's exact logits (which switch to the 3-limb sum for
        long rows) — e.g. a 384²-resolution ViT (N=577). Exercised at
        72²/patch 4 (N=325 > 256) to keep CPU time sane."""
        import warnings

        model = VisionTransformer(
            img_size=72, patch_size=4, num_classes=8,
            embed_dim=32, depth=1, num_heads=2,
        )
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 72, 72, 3))
        variables = model.init(jax.random.PRNGKey(4), x, train=True)
        _, upd = model.apply(
            variables, x, train=True, mutable=["quant_stats"]
        )
        variables = {"params": variables["params"], **upd}
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
        base = np.asarray(build_vit_infer(artifact, use_pallas=False)(x))
        for kw in (
            dict(use_pallas=True, pallas_ops=("attention",)),
            dict(use_pallas=True, pallas_ops=("attention2",)),
            dict(use_pallas=True, pallas_ops=("softmax",),
                 attn_v_mode="exact"),
        ):
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                fn = build_vit_infer(artifact, pallas_interpret=True, **kw)
            assert any("256" in str(x.message) for x in w), kw
            np.testing.assert_array_equal(
                np.asarray(fn(x)), base, err_msg=str(kw)
            )


class TestSm8Mode:
    """softmax_bits=8 — the reference TVM graph's own deploy precision
    (int8 probabilities + pure int8 attn@V, layers.py:384-386,
    quantized_vit.py:71-75). Sim and engine must agree within the mode
    exactly as the 16-bit mode does."""

    def _trained(self):
        model = VisionTransformer(
            img_size=16, patch_size=8, num_classes=8,
            embed_dim=32, depth=2, num_heads=4, softmax_bits=8,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=True)
        for i in range(3):
            xi = jax.random.normal(jax.random.PRNGKey(10 + i), (4, 16, 16, 3))
            _, upd = model.apply(
                variables, xi, train=True, mutable=["quant_stats"]
            )
            variables = {"params": variables["params"], **upd}
        return model, variables

    def test_sim_deploy_parity_sm8(self):
        model, variables = self._trained()
        x = jax.random.normal(jax.random.PRNGKey(42), (4, 16, 16, 3))
        sim_logits = np.asarray(model.apply(variables, x, train=False))
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
        assert artifact["config"]["softmax_bits"] == 8
        infer = jax.jit(build_vit_infer(artifact, use_pallas=False))
        dep_logits = np.asarray(infer(x))
        head_scale = float(np.max(artifact["head"]["out_scale"]))
        np.testing.assert_allclose(
            dep_logits, sim_logits, atol=3 * head_scale, rtol=0
        )
        np.testing.assert_array_equal(
            np.argmax(dep_logits, -1), np.argmax(sim_logits, -1)
        )

    def test_sm8_variants_bit_match_default(self):
        """Every engine knob must stay value-identical under sm8 too."""
        model, variables = self._trained()
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 3))
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
        base = np.asarray(build_vit_infer(artifact, use_pallas=False)(x))
        for kw in (
            dict(sm_int_lanes=True),
            dict(sm_split=True),
            dict(sm_packed=True),
            dict(proj_4d=True),
            dict(res_split=True),
            dict(attn_v_mode="exact"),  # collapses to the int8 dot
            dict(sm_int16=True),        # inert at 8 bits
            dict(qkv_t=True),           # transposed qkv stream
            dict(qkv_t=True, sm_split=True),
            dict(qkv_t="bbatch"),       # B-batched transposed stream
        ):
            out = np.asarray(
                build_vit_infer(artifact, use_pallas=False, **kw)(x)
            )
            np.testing.assert_array_equal(out, base, err_msg=str(kw))

    def test_sm16_default_unchanged(self):
        """Legacy artifacts (no softmax_bits key) still run 16-bit."""
        model, variables = trained_tiny()
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
        assert artifact["config"]["softmax_bits"] == 16
        del artifact["config"]["softmax_bits"]
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
        out = np.asarray(build_vit_infer(artifact, use_pallas=False)(x))
        sim = np.asarray(model.apply(variables, x, train=False))
        head_scale = float(np.max(artifact["head"]["out_scale"]))
        np.testing.assert_allclose(out, sim, atol=3 * head_scale, rtol=0)


class TestGeluStable:
    """gelu_stable=True — the elementwise-stable ShiftGELU (one exp
    chain per element, no row reduce; ops/shiftgelu). A recorded model
    property: sim and engine must agree within the mode exactly as the
    reference-spec mode does."""

    def _trained(self):
        model = VisionTransformer(
            img_size=16, patch_size=8, num_classes=8,
            embed_dim=32, depth=2, num_heads=4, gelu_stable=True,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=True)
        for i in range(3):
            xi = jax.random.normal(jax.random.PRNGKey(30 + i), (4, 16, 16, 3))
            _, upd = model.apply(
                variables, xi, train=True, mutable=["quant_stats"]
            )
            variables = {"params": variables["params"], **upd}
        return model, variables

    def test_sim_deploy_parity_gelu_stable(self):
        model, variables = self._trained()
        x = jax.random.normal(jax.random.PRNGKey(42), (4, 16, 16, 3))
        sim_logits = np.asarray(model.apply(variables, x, train=False))
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
        assert artifact["config"]["gelu_stable"] is True
        dep_logits = np.asarray(
            jax.jit(build_vit_infer(artifact, use_pallas=False))(x)
        )
        head_scale = float(np.max(artifact["head"]["out_scale"]))
        np.testing.assert_allclose(
            dep_logits, sim_logits, atol=3 * head_scale, rtol=0
        )
        np.testing.assert_array_equal(
            np.argmax(dep_logits, -1), np.argmax(sim_logits, -1)
        )

    def test_sim_deploy_parity_sm8_gelu_stable_combined(self):
        """The shipping perf config (bench.py): softmax_bits=8 AND
        gelu_stable=True together. Parity of each mode alone does not
        imply parity of the combination (the two rewrites share the
        shift-exp chain), so the combo gets its own test."""
        model = VisionTransformer(
            img_size=16, patch_size=8, num_classes=8,
            embed_dim=32, depth=2, num_heads=4,
            softmax_bits=8, gelu_stable=True,
        )
        x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(1), x0, train=True)
        for i in range(3):
            xi = jax.random.normal(jax.random.PRNGKey(50 + i), (4, 16, 16, 3))
            _, upd = model.apply(
                variables, xi, train=True, mutable=["quant_stats"]
            )
            variables = {"params": variables["params"], **upd}
        x = jax.random.normal(jax.random.PRNGKey(42), (4, 16, 16, 3))
        sim_logits = np.asarray(model.apply(variables, x, train=False))
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
        assert artifact["config"]["softmax_bits"] == 8
        assert artifact["config"]["gelu_stable"] is True
        infer = jax.jit(build_vit_infer(artifact, use_pallas=False))
        dep_logits = np.asarray(infer(x))
        head_scale = float(np.max(artifact["head"]["out_scale"]))
        np.testing.assert_allclose(
            dep_logits, sim_logits, atol=3 * head_scale, rtol=0
        )
        np.testing.assert_array_equal(
            np.argmax(dep_logits, -1), np.argmax(sim_logits, -1)
        )

    def test_gelu_stable_variants_bit_match_default(self):
        model, variables = self._trained()
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 3))
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
        base = np.asarray(build_vit_infer(artifact, use_pallas=False)(x))
        for kw in (
            dict(sm_int_lanes=True),
            dict(sm_split=True),
            dict(sm_packed=True),
            dict(res_split=True),
            dict(attn_v_mode="exact"),
            dict(gelu_int_lanes=True),  # int32-lane stable-GELU twin
        ):
            out = np.asarray(
                build_vit_infer(artifact, use_pallas=False, **kw)(x)
            )
            np.testing.assert_array_equal(out, base, err_msg=str(kw))
