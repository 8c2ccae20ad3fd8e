"""Pallas kernel bit-exactness vs the pure-JAX DEPLOY ops (SURVEY.md §4b).

Runs in interpret mode on CPU; the same kernels compile on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ivit_tpu.kernels import (
    fused_layernorm_requant,
    fused_requant_shiftgelu,
    fused_requant_shiftmax,
)
from ivit_tpu.ops import DEPLOY, int_layernorm, requantize, shiftgelu, shiftmax


def _requant_ref(x, r, lo, hi):
    return np.clip(np.round(np.asarray(x, np.float32) * r), lo, hi)


class TestShiftmaxKernel:
    def test_bit_exact_vs_ops(self):
        M, N, Npad = 64, 197, 256
        rng = np.random.default_rng(0)
        x = rng.integers(-(2**20), 2**20, (M, Npad)).astype(np.int32)
        r1, scale = 3.1e-5, 0.021

        hi, lo = fused_requant_shiftmax(
            jnp.asarray(x), r1, scale, n_valid=N, out_bits=16, interpret=True
        )
        sm_kernel = (
            256.0 * np.asarray(hi, np.int32)
            + (np.asarray(lo, np.int32) + 128)
        )

        # reference composition on the valid columns only
        q = _requant_ref(x[:, :N], r1, -128, 127)
        sm_ref, s_out = shiftmax(
            jnp.asarray(q), jnp.float32(scale), out_bits=16, interp=DEPLOY
        )
        np.testing.assert_array_equal(sm_kernel[:, :N], np.asarray(sm_ref))
        # padded columns decode to exactly zero probability
        np.testing.assert_array_equal(sm_kernel[:, N:], 0)

    def test_row_sums_near_unity(self):
        M, Npad = 32, 128
        rng = np.random.default_rng(1)
        x = rng.integers(-(2**18), 2**18, (M, Npad)).astype(np.int32)
        hi, lo = fused_requant_shiftmax(
            jnp.asarray(x), 1e-4, 0.05, n_valid=Npad, out_bits=16, interpret=True
        )
        sm = 256.0 * np.asarray(hi, np.float64) + np.asarray(lo, np.float64) + 128
        sums = sm.sum(-1) / 2.0**15
        assert np.all(np.abs(sums - 1.0) < 0.02)


class TestShiftGeluKernel:
    def test_bit_exact_vs_ops(self):
        M, C = 48, 256
        rng = np.random.default_rng(2)
        x = rng.integers(-(2**16), 2**16, (M, C)).astype(np.int32)
        r1 = (rng.uniform(0.5, 2.0, (C,)) * 1e-4).astype(np.float32)
        s_in, r2 = 0.031, 0.7

        out = fused_requant_shiftgelu(
            jnp.asarray(x), jnp.asarray(r1), s_in, r2, out_bits=8, interpret=True
        )

        q = np.clip(np.round(x.astype(np.float32) * r1), -128, 127)
        g, s_g = shiftgelu(
            jnp.asarray(q), jnp.float32(s_in), out_bits=8, interp=DEPLOY
        )
        ref = _requant_ref(np.asarray(g), r2, -128, 127)
        np.testing.assert_array_equal(np.asarray(out, np.float32), ref)


class TestLayerNormKernel:
    def test_bit_exact_vs_ops(self):
        M, C = 40, 384
        rng = np.random.default_rng(3)
        x = rng.integers(-(2**15), 2**15, (M, C)).astype(np.float32)
        gamma = rng.uniform(0.5, 1.5, (C,)).astype(np.float32)
        beta = rng.normal(size=(C,)).astype(np.float32)
        s_out = 0.04

        y_ref, s_ref = int_layernorm(
            jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), interp=DEPLOY
        )
        ref = _requant_ref(
            np.asarray(y_ref) * 0 + np.asarray(y_ref),
            np.asarray(s_ref) / s_out,
            -128,
            127,
        )

        base = np.float32(np.sqrt(C) / 2.0**30)
        bias_int = np.floor((beta / gamma) / base).astype(np.float32)
        ratio = (gamma * base / np.float32(s_out)).astype(np.float32)
        out = fused_layernorm_requant(
            jnp.asarray(x), jnp.asarray(bias_int), jnp.asarray(ratio),
            bits=8, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(out, np.float32), ref)


class TestLinearGeluKernel:
    def test_bit_exact_vs_ops(self):
        """fc1 matmul + requant→ShiftGELU→requant epilogue vs the XLA
        composition (int8 dot → requantize → shiftgelu → requantize)."""
        from ivit_tpu.kernels.linear_gelu_fused import fused_linear_shiftgelu

        M, K, C = 64, 48, 128
        rng = np.random.default_rng(0)
        x = rng.integers(-128, 128, (M, K)).astype(np.int8)
        w = rng.integers(-128, 128, (K, C)).astype(np.int8)
        b = rng.integers(-(2**15), 2**15, (C,)).astype(np.int32)
        r1 = (rng.uniform(0.5, 2.0, (C,)) * 1e-4).astype(np.float32)
        s_in, r2 = 0.031, 0.52

        out = fused_linear_shiftgelu(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
            jnp.asarray(r1), s_in=s_in, r2=r2, out_bits=8, interpret=True,
        )

        acc = (
            x.astype(np.int32) @ w.astype(np.int32) + b
        ).astype(np.float32)
        gq = _requant_ref(acc, r1, -128, 127)
        g, _ = shiftgelu(
            jnp.asarray(gq), jnp.float32(s_in), out_bits=8, interp=DEPLOY
        )
        ref = _requant_ref(np.asarray(g), r2, -128, 127)
        np.testing.assert_array_equal(np.asarray(out, np.float32), ref)
