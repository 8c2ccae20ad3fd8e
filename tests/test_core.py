"""Unit tests for core numerics: STE, scales, dyadic requantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.core import (
    dyadic_decompose,
    dyadic_mul_exact,
    dyadic_requant,
    floor_ste,
    int_range,
    quantize,
    requant_f32,
    round_ste,
    symmetric_scale,
    weight_scale,
)
from ivit_tpu.core.qtensor import QTensor


class TestSTE:
    def test_round_forward(self):
        x = jnp.array([1.4, 1.5, -1.5, 2.5, -0.4])
        np.testing.assert_array_equal(round_ste(x), jnp.round(x))

    def test_floor_forward(self):
        x = jnp.array([1.4, -1.5, 2.9, -0.1])
        np.testing.assert_array_equal(floor_ste(x), jnp.floor(x))

    def test_round_grad_identity(self):
        g = jax.grad(lambda x: jnp.sum(round_ste(x) * 3.0))(jnp.array([1.3, -2.7]))
        np.testing.assert_allclose(g, [3.0, 3.0])

    def test_floor_grad_identity(self):
        g = jax.grad(lambda x: jnp.sum(floor_ste(x) * 2.0))(jnp.array([1.3, -2.7]))
        np.testing.assert_allclose(g, [2.0, 2.0])

    def test_quantize_values_and_range(self):
        x = jnp.array([0.0, 0.05, -0.05, 100.0, -100.0])
        scale = jnp.float32(0.1)
        q = quantize(x, scale, 8)
        lo, hi = int_range(8)
        assert q.min() >= lo and q.max() <= hi
        assert q[0] == 0.0
        assert q[3] == 127.0 and q[4] == -128.0

    def test_quantize_grad_is_inverse_scale(self):
        # Reference SymmetricQuantFunction backward: grad/scale, even
        # outside the clamp range (quant_utils.py:98-119).
        scale = jnp.float32(0.25)
        g = jax.grad(lambda x: jnp.sum(quantize(x, scale, 8)))(
            jnp.array([0.3, 100.0])
        )
        np.testing.assert_allclose(g, [4.0, 4.0])


class TestScales:
    def test_symmetric_scale(self):
        s = symmetric_scale(jnp.float32(-2.0), jnp.float32(1.0), 8)
        np.testing.assert_allclose(s, 2.0 / 127.0, rtol=1e-6)

    def test_symmetric_scale_eps_clamp(self):
        s = symmetric_scale(jnp.float32(0.0), jnp.float32(0.0), 8)
        assert s > 0

    def test_weight_scale_per_channel(self):
        w = jnp.array([[1.0, -3.0], [0.5, 0.25]])  # (out, in)
        s = weight_scale(w, 8)
        np.testing.assert_allclose(s, [3.0 / 127.0, 0.5 / 127.0], rtol=1e-6)

    def test_no_grad_through_scale(self):
        g = jax.grad(lambda w: jnp.sum(weight_scale(w, 8)))(jnp.ones((4, 4)))
        np.testing.assert_array_equal(g, jnp.zeros((4, 4)))


class TestDyadic:
    def test_decompose_reconstruction(self):
        r = jnp.array([0.5, 1.0, 0.001, 123.456, 1e-6], dtype=jnp.float32)
        m, e = dyadic_decompose(r)
        m_np = np.asarray(m).astype(np.float64)
        recon = m_np / np.exp2(np.asarray(e).astype(np.float64))
        np.testing.assert_allclose(recon, np.asarray(r, np.float64), rtol=1e-7)
        assert (m_np >= 2**30).all() and (m_np < 2**31).all()

    def test_exact_mul_vs_float64_oracle(self):
        rng = np.random.default_rng(0)
        z = rng.integers(-(2**24), 2**24, size=(1000,)).astype(np.int32)
        r = np.float32(10.0) ** rng.uniform(-4, 2, size=(1000,)).astype(np.float32)
        m, e = dyadic_decompose(jnp.asarray(r))
        got = dyadic_mul_exact(jnp.asarray(z), m, e)
        # Oracle: round-half-away of the exact rational z*m/2^e in float64
        # (exact for these magnitudes).
        exact = z.astype(np.float64) * np.asarray(m, np.float64) / np.exp2(
            np.asarray(e, np.float64)
        )
        oracle = np.sign(exact) * np.floor(np.abs(exact) + 0.5)
        np.testing.assert_array_equal(np.asarray(got, np.float64), oracle)

    def test_exact_mul_large_values(self):
        # Exercise the carry paths with |z| near 2^31.
        z = jnp.array([2**31 - 1, -(2**31) + 1, 2**30, -(2**30)], dtype=jnp.int32)
        r = jnp.array([1e-5, 1e-5, 0.25, 0.25], dtype=jnp.float32)
        m, e = dyadic_decompose(r)
        got = dyadic_mul_exact(z, m, e)
        exact = np.asarray(z, np.float64) * np.asarray(m, np.float64) / np.exp2(
            np.asarray(e, np.float64)
        )
        oracle = np.sign(exact) * np.floor(np.abs(exact) + 0.5)
        np.testing.assert_array_equal(np.asarray(got, np.float64), oracle)

    def test_dyadic_requant_close_to_f32(self):
        rng = np.random.default_rng(1)
        z = rng.integers(-(2**20), 2**20, size=(4096,)).astype(np.int32)
        r = np.float32(0.0037)
        a = dyadic_requant(jnp.asarray(z), jnp.float32(r))
        b = requant_f32(jnp.asarray(z), jnp.float32(r))
        assert np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max() <= 1


class TestQTensor:
    def test_pytree_roundtrip(self):
        t = QTensor(q=jnp.ones((2, 3)), scale=jnp.float32(0.5), bits=8)
        leaves, treedef = jax.tree_util.tree_flatten(t)
        t2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert t2.bits == 8
        np.testing.assert_array_equal(t2.q, t.q)

    def test_dequantize_per_channel(self):
        t = QTensor(
            q=jnp.ones((2, 3)), scale=jnp.array([1.0, 2.0, 3.0]), bits=8
        )
        np.testing.assert_array_equal(t.x[0], [1.0, 2.0, 3.0])

    def test_jit_through(self):
        t = QTensor(q=jnp.ones((4,)), scale=jnp.float32(2.0), bits=16)

        @jax.jit
        def f(t):
            return t.replace(q=t.q * 2)

        out = f(t)
        assert out.bits == 16
        np.testing.assert_array_equal(out.q, 2 * jnp.ones((4,)))
