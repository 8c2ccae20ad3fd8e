"""f32-carrier integer ops vs the exact-int64 C++ oracle.

The TPU ops carry integers in f32 lanes; this quantifies and pins the
deviation from true integer-ISA semantics (the role TVM's integer CUDA
plays in the reference):

* the 16-bit-limb dyadic requant must be EXACTLY the int64 result;
* Shiftmax/ShiftGELU/I-LayerNorm are allowed the documented f32
  rounding above 2^24 — bounded to ≤1 output LSB here.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.core.dyadic import dyadic_decompose, dyadic_mul_exact
from ivit_tpu.native import (
    dyadic_decompose_oracle,
    dyadic_mul_oracle,
    int_layernorm_oracle,
    oracle_available,
    shiftgelu_oracle,
    shiftmax_oracle,
)
from ivit_tpu.ops import DEPLOY, int_layernorm, shiftgelu, shiftmax

pytestmark = pytest.mark.skipif(
    not oracle_available(), reason="no C++ toolchain"
)


class TestDyadicExact:
    def test_decompose_matches(self):
        r = np.exp(np.random.default_rng(0).uniform(-12, 12, 256)).astype(
            np.float32
        )
        m_j, e_j = dyadic_decompose(jnp.asarray(r))
        m_o, e_o = dyadic_decompose_oracle(r)
        np.testing.assert_array_equal(np.asarray(m_j), m_o)
        np.testing.assert_array_equal(np.asarray(e_j), e_o)

    def test_limb_multiply_bit_exact(self):
        rng = np.random.default_rng(1)
        z = rng.integers(-(2**30), 2**30, 4096).astype(np.int32)
        # include extremes
        z[:4] = [2**30 - 1, -(2**30), 1, -1]
        for ratio in (0.37, 1.0, 123.456, 7.3e-5):
            m, e = dyadic_decompose_oracle(np.float32([ratio]))
            ours = dyadic_mul_exact(
                jnp.asarray(z),
                jnp.full(z.shape, m[0], jnp.int32),
                jnp.full(z.shape, e[0], jnp.int32),
            )
            ref = dyadic_mul_oracle(z, m[0], e[0])
            np.testing.assert_array_equal(np.asarray(ours), ref)


class TestF32CarrierDeviationBounds:
    def test_shiftmax_within_one_lsb(self):
        rng = np.random.default_rng(2)
        x = rng.integers(-128, 128, (64, 197)).astype(np.int32)
        scale = 0.021
        ref = shiftmax_oracle(x, scale, out_bits=16, n=15)
        ours, _ = shiftmax(
            jnp.asarray(x, jnp.float32), jnp.float32(scale),
            out_bits=16, interp=DEPLOY,
        )
        assert np.max(np.abs(np.asarray(ours) - ref)) <= 1

    def test_shiftgelu_within_one_lsb_of_sigmoid(self):
        rng = np.random.default_rng(3)
        x = rng.integers(-128, 128, (32, 256)).astype(np.int32)
        scale = 0.05
        ref = shiftgelu_oracle(x, scale * 1.702, out_bits=8, n=23)
        ours, _ = shiftgelu(
            jnp.asarray(x, jnp.float32), jnp.float32(scale),
            out_bits=8, interp=DEPLOY,
        )
        # output = q * sigmoid_int: one sigmoid LSB scales by |q| ≤ 128
        assert np.max(np.abs(np.asarray(ours) - ref)) <= 128

    def test_layernorm_small_relative_deviation(self):
        rng = np.random.default_rng(4)
        x = rng.integers(-(2**14), 2**14, (16, 384)).astype(np.int32)
        ref = int_layernorm_oracle(x)
        ours, _ = int_layernorm(
            jnp.asarray(x, jnp.float32),
            jnp.ones((384,)),
            jnp.zeros((384,)),
            interp=DEPLOY,
        )
        ours = np.asarray(ours)
        denom = np.maximum(np.abs(ref), 2**16)
        assert np.max(np.abs(ours - ref) / denom) < 2e-5
