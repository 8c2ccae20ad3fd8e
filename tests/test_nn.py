"""Tests for the quantized layer zoo (nn/).

Strategy per SURVEY.md §4: (a) each quantized layer against its float
oracle within quantization tolerance; (c) scale-propagation invariants —
integer-valued carriers within bitwidth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.core.qtensor import QTensor, int_range
from ivit_tpu.nn import (
    Attention,
    Block,
    IntGELU,
    IntLayerNorm,
    IntSoftmax,
    Mlp,
    QuantAct,
    QuantConv2d,
    QuantLinear,
    QuantPatchEmbed,
    quant_matmul,
)


def assert_integral(q, tol=1e-3):
    np.testing.assert_allclose(q, np.round(q), atol=tol)


def make_qtensor(key, shape, bits=8, scale=0.02):
    lo, hi = int_range(min(bits, 16))
    q = jax.random.randint(key, shape, lo, hi + 1).astype(jnp.float32)
    return QTensor(q=q, scale=jnp.float32(scale), bits=bits)


class TestQuantAct:
    def test_first_call_initializes_range(self):
        m = QuantAct(bits=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16)) * 3.0
        variables = m.init(jax.random.PRNGKey(1), x, update_stats=True)
        out, new_vars = m.apply(
            variables, x, update_stats=True, mutable=["quant_stats"]
        )
        stats = new_vars["quant_stats"]
        assert float(stats["min_val"]) == pytest.approx(float(x.min()), rel=1e-6)
        assert float(stats["max_val"]) == pytest.approx(float(x.max()), rel=1e-6)
        assert_integral(out.q)
        lo, hi = int_range(8)
        assert out.q.min() >= lo and out.q.max() <= hi
        # Quantization error bounded by scale/2 within range.
        np.testing.assert_allclose(
            out.dequantize(), np.clip(x, lo * out.scale, hi * out.scale),
            atol=float(out.scale) / 2 + 1e-6,
        )

    def test_ema_update(self):
        m = QuantAct(bits=8, momentum=0.9)
        x1 = jnp.array([[-2.0, -1.0], [0.5, 1.0]])
        variables = m.init(jax.random.PRNGKey(0), x1, update_stats=True)
        _, v1 = m.apply(variables, x1, update_stats=True, mutable=["quant_stats"])
        x2 = jnp.array([[-4.0, 0.0], [0.0, 5.0]])
        _, v2 = m.apply(
            {**variables, **v1}, x2, update_stats=True, mutable=["quant_stats"]
        )
        # EMA: 0.9*old + 0.1*new
        assert float(v2["quant_stats"]["max_val"]) == pytest.approx(
            0.9 * 1.0 + 0.1 * 5.0, rel=1e-5
        )
        assert float(v2["quant_stats"]["min_val"]) == pytest.approx(
            0.9 * (-2.0) + 0.1 * (-4.0), rel=1e-5
        )

    def test_frozen_stats_do_not_move(self):
        m = QuantAct(bits=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
        variables = m.init(jax.random.PRNGKey(1), x, update_stats=True)
        out1 = m.apply(variables, x * 100.0, update_stats=False)
        out2 = m.apply(variables, x, update_stats=False)
        assert float(out1.scale) == float(out2.scale)

    def test_gradient_is_identity_in_real_units(self):
        """Reference convention: STE makes d(real_out)/d(real_in) ≈ 1
        through a QuantAct (SymmetricQuantFunction bwd grad/scale,
        quant_utils.py:98-119, composed with the output rescale)."""
        m = QuantAct(bits=8)
        x = make_qtensor(jax.random.PRNGKey(3), (4, 16), bits=32, scale=1e-3)
        variables = m.init(jax.random.PRNGKey(4), x, update_stats=True)

        def real_out_sum(q_in):
            out = m.apply(variables, QTensor(q=q_in, scale=x.scale, bits=32))
            return jnp.sum(out.dequantize())

        g = jax.grad(real_out_sum)(x.q)
        # d(real_out)/d(q_in) = scale_in  ⇒  in real units the chain is
        # identity: g / scale_in ≈ 1 wherever not clipped
        ratio = np.asarray(g) / float(x.scale)
        assert np.mean(np.abs(ratio - 1.0) < 1e-4) > 0.9

    def test_requantize_path_and_residual(self):
        key = jax.random.PRNGKey(0)
        x = make_qtensor(key, (2, 8, 16), bits=32, scale=1e-4)
        ident = make_qtensor(jax.random.PRNGKey(1), (2, 8, 16), bits=16, scale=3e-3)
        m = QuantAct(bits=16)
        variables = m.init(jax.random.PRNGKey(2), x, identity=ident, update_stats=True)
        out, _ = m.apply(
            variables, x, identity=ident, update_stats=True, mutable=["quant_stats"]
        )
        assert_integral(out.q)
        real = x.dequantize() + ident.dequantize()
        np.testing.assert_allclose(
            out.dequantize(), real, atol=2.1 * float(out.scale)
        )


class TestQuantLinear:
    def test_matches_float_oracle(self):
        key = jax.random.PRNGKey(0)
        x = make_qtensor(key, (4, 32), bits=8, scale=0.05)
        m = QuantLinear(features=16)
        variables = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(variables, x)
        assert_integral(out.q, tol=1e-2)
        kernel = variables["params"]["kernel"]
        bias = variables["params"]["bias"]
        oracle = x.dequantize() @ kernel + bias
        # int8 weights: relative error ~ 1/127 of weight magnitude
        err = np.abs(out.dequantize() - oracle)
        scale_bound = np.max(np.abs(kernel)) / 127 * np.sum(
            np.abs(x.dequantize()), axis=-1, keepdims=True
        )
        assert np.all(err <= scale_bound + 1e-5)

    def test_per_channel_scale_shape(self):
        x = make_qtensor(jax.random.PRNGKey(0), (2, 3, 8), bits=8)
        m = QuantLinear(features=12)
        variables = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(variables, x)
        assert out.scale.shape == (12,)
        assert out.shape == (2, 3, 12)


class TestQuantMatMul:
    def test_scale_product(self):
        a = make_qtensor(jax.random.PRNGKey(0), (2, 4, 8), scale=0.1)
        b = make_qtensor(jax.random.PRNGKey(1), (2, 8, 4), scale=0.2)
        out = quant_matmul(a, b)
        assert float(out.scale) == pytest.approx(0.1 * 0.2)
        np.testing.assert_allclose(
            out.dequantize(), a.dequantize() @ b.dequantize(), rtol=1e-5
        )


class TestPatchEmbed:
    def test_space_to_depth_equals_conv(self):
        """Patch embed as reshape+matmul == stride=kernel convolution."""
        key = jax.random.PRNGKey(0)
        img = jax.random.randint(key, (2, 8, 8, 3), -127, 128).astype(jnp.float32)
        x = QTensor(q=img, scale=jnp.float32(0.01), bits=8)

        pe = QuantPatchEmbed(patch_size=4, features=6)
        variables = pe.init(jax.random.PRNGKey(1), x)
        out = pe.apply(variables, x)
        assert out.shape == (2, 4, 6)

        # Build the equivalent conv kernel from the matmul kernel:
        # row index ordered (ph, pw, c) -> (kh, kw, in, out).
        kmat = variables["params"]["proj"]["kernel"]  # (4*4*3, 6)
        kconv = kmat.reshape(4, 4, 3, 6)
        conv = QuantConv2d(features=6, kernel_size=(4, 4), strides=(4, 4))
        cvars = {
            "params": {
                "kernel": kconv,
                "bias": variables["params"]["proj"]["bias"],
            }
        }
        cout = conv.apply(cvars, x)
        np.testing.assert_allclose(
            out.dequantize().reshape(2, 2, 2, 6), cout.dequantize(), rtol=1e-5
        )


class TestQuantConv2d:
    def test_general_conv_vs_float_oracle(self):
        """Non-patch conv (stride < kernel) against the float conv."""
        key = jax.random.PRNGKey(0)
        img = jax.random.randint(key, (2, 9, 9, 4), -127, 128).astype(
            jnp.float32
        )
        x = QTensor(q=img, scale=jnp.float32(0.02), bits=8)
        m = QuantConv2d(features=6, kernel_size=(3, 3), strides=(2, 2))
        variables = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(variables, x)
        assert out.shape == (2, 4, 4, 6)
        assert out.scale.shape == (6,)
        assert_integral(out.q, tol=1e-2)

        kernel = variables["params"]["kernel"]
        bias = variables["params"]["bias"]
        oracle = jax.lax.conv_general_dilated(
            x.dequantize(), kernel, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        err = np.abs(np.asarray(out.dequantize()) - np.asarray(oracle))
        # int8 weight quantization error bound
        bound = float(jnp.max(jnp.abs(kernel))) / 127 * float(
            jnp.max(jnp.sum(jnp.abs(x.dequantize())))
        )
        assert err.max() <= bound + 1e-4


class TestIntModules:
    def test_int_layernorm_module(self):
        x = make_qtensor(jax.random.PRNGKey(0), (2, 5, 64), bits=8, scale=0.03)
        m = IntLayerNorm(features=64)
        variables = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(variables, x)
        oracle = jax.nn.standardize(x.dequantize(), axis=-1, epsilon=1e-12)
        np.testing.assert_allclose(out.dequantize(), oracle, atol=0.02)

    def test_int_softmax_module(self):
        x = make_qtensor(jax.random.PRNGKey(0), (2, 3, 4, 16), bits=8, scale=0.05)
        m = IntSoftmax(out_bits=16)
        out = m.apply({}, x)
        oracle = jax.nn.softmax(x.dequantize(), axis=-1)
        np.testing.assert_allclose(out.dequantize(), oracle, atol=0.02)

    def test_int_gelu_module(self):
        x = make_qtensor(jax.random.PRNGKey(0), (2, 4, 32), bits=8, scale=0.05)
        m = IntGELU(out_bits=8)
        out = m.apply({}, x)
        oracle = x.dequantize() * jax.nn.sigmoid(1.702 * x.dequantize())
        # 8-bit sigmoid + shift-exp approximation: error grows with |x|
        # (identical in the reference; paper tolerates ≤0.3% top-1 delta).
        np.testing.assert_allclose(out.dequantize(), oracle, atol=0.15)


class TestBlocks:
    def test_mlp_forward(self):
        x = make_qtensor(jax.random.PRNGKey(0), (2, 5, 32), bits=8, scale=0.02)
        m = Mlp(hidden_features=64, out_features=32)
        variables = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(variables, x)
        assert out.shape == (2, 5, 32)
        assert out.bits == 16
        assert_integral(out.q, tol=1e-2)

    def test_attention_forward(self):
        x = make_qtensor(jax.random.PRNGKey(0), (2, 5, 32), bits=8, scale=0.02)
        m = Attention(dim=32, num_heads=4)
        variables = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(variables, x)
        assert out.shape == (2, 5, 32)
        assert_integral(out.q, tol=1e-2)

    def test_dropout_keeps_carrier_integral(self):
        """Dropout must mask the integer carrier 0/1 and fold 1/keep
        into the scale — nn.Dropout's carrier rescale would wrap in the
        exact int8 dots (round-1 advisor finding)."""
        x = make_qtensor(jax.random.PRNGKey(0), (2, 5, 32), bits=8, scale=0.02)
        m = Mlp(hidden_features=64, out_features=32, drop=0.5)
        variables = m.init(
            {"params": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            x, train=True,
        )
        out = m.apply(
            variables, x, train=True,
            mutable=["quant_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)},
        )[0]
        assert_integral(out.q, tol=1e-2)

        a = Attention(dim=32, num_heads=4, attn_drop=0.5, proj_drop=0.5)
        av = a.init(
            {"params": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            x, train=True,
        )
        aout = a.apply(
            av, x, train=True,
            mutable=["quant_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)},
        )[0]
        assert_integral(aout.q, tol=1e-2)
        assert bool(jnp.all(jnp.isfinite(aout.q)))

    def test_block_forward_and_grad(self):
        x = make_qtensor(jax.random.PRNGKey(0), (2, 5, 32), bits=16, scale=0.01)
        m = Block(dim=32, num_heads=4)
        variables = m.init(jax.random.PRNGKey(1), x)

        out = m.apply(variables, x)
        assert out.shape == (2, 5, 32)
        assert_integral(out.q, tol=1e-2)

        # Gradients flow to every parameter through the STE chain.
        def loss_fn(params):
            o = m.apply({**variables, "params": params}, x)
            return jnp.sum(o.dequantize() ** 2)

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves_with_path(grads)
        for path, g in leaves:
            name = jax.tree_util.keystr(path)
            # I-LayerNorm β is detached by design (the reference detaches
            # it too: quant_modules.py:377); everything else must train.
            if "norm" in name and "bias" in name:
                assert float(jnp.abs(g).max()) == 0.0, name
            else:
                assert float(jnp.abs(g).max()) > 0.0, name
