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


class TestWindowAttentionKernel:
    def _reference(self, q, k, v, bias, mask, r1, rb, scale, r_out,
                   heads, n_w, n_valid):
        """XLA oracle: deploy/swin_engine._attention's exact op chain on
        the (G, N, hd) cell layout."""
        G, N, hd = q.shape
        attn = np.einsum(
            "gnd,gmd->gnm", q.astype(np.int64), k.astype(np.int64)
        ).astype(np.float32)
        a8 = np.clip(np.round(attn * np.float32(r1)), -128, 127)
        z = np.clip(
            np.round(a8 * np.float32(rb))
            + bias[np.arange(G) % heads], -128, 127,
        )
        if mask is not None:
            z = z + mask[(np.arange(G) // heads) % n_w]
        sm, _ = shiftmax(
            jnp.asarray(z), jnp.float32(scale), out_bits=8, interp=DEPLOY,
            mask=None,
        )
        sm = np.asarray(sm)
        ctx = np.einsum(
            "gnm,gmd->gnd", sm.astype(np.int64), v.astype(np.int64)
        ).astype(np.float32)
        return np.clip(np.round(ctx * np.float32(r_out)), -128, 127)

    def _run(self, masked):
        from ivit_tpu.kernels.window_attention_fused import (
            fused_int8_window_attention,
        )

        B, n_w, heads, N, hd, Npad = 2, 4, 2, 49, 32, 128
        G = B * n_w * heads
        rng = np.random.default_rng(5 if masked else 6)
        q = rng.integers(-128, 128, (G, Npad, hd)).astype(np.int8)
        k = rng.integers(-128, 128, (G, Npad, hd)).astype(np.int8)
        v = rng.integers(-128, 128, (G, Npad, hd)).astype(np.int8)
        # zero the padded token rows the way the engine feeds them
        q[:, N:] = 0
        k[:, N:] = 0
        v[:, N:] = 0
        bias = np.zeros((heads, Npad, Npad), np.float32)
        bias[:, :N, :N] = rng.integers(-30, 31, (heads, N, N))
        scale = 0.0308
        mask = None
        if masked:
            mask = np.zeros((n_w, Npad, Npad), np.float32)
            block = rng.random((n_w, N, N)) < 0.3
            mask[:, :N, :N] = np.where(block, -100.0 / scale, 0.0)
        r1, rb, r_out = 1.3e-4, 0.43, 0.0021

        out = fused_int8_window_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bias),
            None if mask is None else jnp.asarray(mask),
            r1=r1, rb=rb, scale=scale, r_out=r_out,
            n_valid=N, heads=heads, interpret=True,
        )
        ref = self._reference(
            q[:, :N].astype(np.int32), k[:, :N].astype(np.int32),
            v[:, :N].astype(np.int32), bias[:, :N, :N],
            None if mask is None else mask[:, :N, :N],
            r1, rb, scale, r_out, heads, n_w, N,
        )
        np.testing.assert_array_equal(
            np.asarray(out, np.float32)[:, :N], ref
        )

    def test_bit_exact_unmasked(self):
        self._run(masked=False)

    def test_bit_exact_masked(self):
        self._run(masked=True)


class TestShiftmaxKernelRowBound:
    def test_long_rows_refused(self):
        """>256 valid columns exceed the 2-limb exact-row-sum bound
        (the XLA path widens to a 3-limb split there; the kernel must
        fail loudly, not silently reintroduce f32 rounding)."""
        import pytest

        x = jnp.zeros((8, 640), jnp.int32)
        with pytest.raises(AssertionError, match="256"):
            fused_requant_shiftmax(
                x, 1e-4, 0.05, n_valid=577, out_bits=16, interpret=True
            )
