"""Integer kernels vs float oracles, and sim↔deploy interpreter parity.

Tolerance bands follow the accuracy the paper relies on (≤0.3% top-1
deltas): shift-exp/Shiftmax/ShiftGELU/I-LayerNorm must approximate their
float counterparts tightly, and the SIM (STE) and DEPLOY interpreters
must agree on forward values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.ops import (
    DEPLOY,
    SIM,
    int_exp_shift,
    int_layernorm,
    requantize,
    shiftgelu,
    shiftmax,
)


def _quant(x, scale):
    return np.round(np.asarray(x) / scale)


class TestRequantize:
    def test_value(self):
        q = jnp.array([100.0, -50.0, 3.0])
        out = requantize(q, jnp.float32(0.02), jnp.float32(0.1), 8)
        np.testing.assert_array_equal(out, [20.0, -10.0, 1.0])

    def test_clamps_to_bits(self):
        q = jnp.array([10000.0, -10000.0])
        out = requantize(q, jnp.float32(1.0), jnp.float32(1.0), 8)
        np.testing.assert_array_equal(out, [127.0, -128.0])

    def test_identity_add(self):
        # Residual merge at differing scales (vit_quant.py:135).
        q = jnp.array([10.0])
        idq = jnp.array([7.0])
        out = requantize(
            q, jnp.float32(0.5), jnp.float32(0.25), 16,
            identity_q=idq, identity_scale=jnp.float32(1.0),
        )
        # 10*0.5/0.25 + 7*1.0/0.25 = 20 + 28
        np.testing.assert_array_equal(out, [48.0])

    def test_strict_dyadic_matches_f32(self):
        rng = np.random.default_rng(2)
        q = rng.integers(-(2**15), 2**15, size=(512,)).astype(np.float32)
        a = requantize(jnp.asarray(q), jnp.float32(0.013), jnp.float32(0.21), 16)
        b = requantize(
            jnp.asarray(q), jnp.float32(0.013), jnp.float32(0.21), 16,
            strict_dyadic=True,
        )
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 1

    def test_sim_gradient_is_scale_ratio(self):
        # STE: d(q_out)/d(q_in) = s_in/s_out (reference fixedpoint_mul
        # backward is grad/z_scale on the float input, which composes to
        # the same thing).
        f = lambda q: jnp.sum(
            requantize(q, jnp.float32(0.5), jnp.float32(0.25), 16, interp=SIM)
        )
        g = jax.grad(f)(jnp.array([3.0, -7.0]))
        np.testing.assert_allclose(g, [2.0, 2.0])

    def test_per_channel_input_scale(self):
        # QuantLinear output scale is per-out-channel; requant must fold
        # each column separately (quant_utils.py:199-205).
        q = jnp.ones((2, 3))
        s_in = jnp.array([0.1, 0.2, 0.4], jnp.float32)
        out = requantize(q, s_in, jnp.float32(0.1), 16)
        np.testing.assert_array_equal(out[0], [1.0, 2.0, 4.0])


class TestShiftExp:
    @pytest.mark.parametrize("n,scale", [(15, 0.01), (15, 0.05), (23, 0.004)])
    def test_matches_exp(self, n, scale):
        x = np.linspace(-8.0, 0.0, 200, dtype=np.float32)
        q = jnp.asarray(_quant(x, scale))
        exp_int, exp_scale = int_exp_shift(q, jnp.float32(scale), n, DEPLOY)
        got = np.asarray(exp_int) * np.asarray(exp_scale)
        want = np.exp(np.asarray(q) * scale)
        # shift-exp is a piecewise-linear base-2 approximation: the
        # 1.4375 vs log2(e)=1.4427 slope plus linear 2^f interpolation
        # give up to ~9% relative error (verified against a float64
        # transcription of the reference algorithm).
        np.testing.assert_allclose(got, want, rtol=0.12, atol=2e-3)

    def test_sim_deploy_forward_parity(self):
        x = np.linspace(-6.0, 0.0, 97, dtype=np.float32)
        scale = 0.02
        q = jnp.asarray(_quant(x, scale))
        a, _ = int_exp_shift(q, jnp.float32(scale), 15, DEPLOY)
        b, _ = int_exp_shift(q, jnp.float32(scale), 15, SIM)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestShiftmax:
    @pytest.mark.parametrize("out_bits", [8, 16])
    def test_matches_softmax(self, out_bits):
        rng = np.random.default_rng(3)
        x = rng.normal(0, 2, size=(4, 8, 50)).astype(np.float32)
        scale = np.float32(np.abs(x).max() / 127.0)
        q = jnp.asarray(_quant(x, scale))
        q_out, s_out = shiftmax(q, scale, out_bits=out_bits, interp=DEPLOY)
        got = np.asarray(q_out) * np.asarray(s_out)
        want = jax.nn.softmax(np.asarray(q) * scale, axis=-1)
        # Band = reference algorithm's intrinsic approximation quality.
        diff = np.abs(got - np.asarray(want))
        assert diff.max() <= 0.08
        assert diff.mean() <= 0.005

    def test_rows_nearly_sum_to_one(self):
        rng = np.random.default_rng(4)
        x = rng.normal(0, 3, size=(16, 64)).astype(np.float32)
        scale = np.float32(np.abs(x).max() / 127.0)
        # 16-bit output: floor losses are ≤ 1/2^15 per element.
        q_out, s_out = shiftmax(jnp.asarray(_quant(x, scale)), scale, 16)
        sums = (np.asarray(q_out) * np.asarray(s_out)).sum(-1)
        np.testing.assert_allclose(sums, 1.0, atol=0.01)
        # 8-bit output: each element floors away up to 1/128 (the
        # reference behaves identically) — rows sum noticeably below 1.
        q_out8, s_out8 = shiftmax(jnp.asarray(_quant(x, scale)), scale, 8)
        sums8 = (np.asarray(q_out8) * np.asarray(s_out8)).sum(-1)
        assert (sums8 > 0.6).all() and (sums8 <= 1.001).all()

    def test_output_integral_and_in_range(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(8, 33)).astype(np.float32)
        scale = np.float32(0.02)
        q_out, _ = shiftmax(jnp.asarray(_quant(x, scale)), scale, 8)
        v = np.asarray(q_out)
        np.testing.assert_array_equal(v, np.round(v))
        assert v.min() >= 0 and v.max() <= 128

    def test_sim_deploy_parity(self):
        rng = np.random.default_rng(6)
        x = rng.normal(0, 2, size=(4, 50)).astype(np.float32)
        scale = np.float32(0.03)
        q = jnp.asarray(_quant(x, scale))
        a, _ = shiftmax(q, scale, 16, interp=DEPLOY)
        b, _ = shiftmax(q, scale, 16, interp=SIM)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 1

    def test_mask(self):
        q = jnp.asarray([[0.0, 0.0, 0.0, 0.0]])
        scale = np.float32(0.05)
        mask = jnp.asarray([[0.0, 0.0, -100.0 / scale, -100.0 / scale]])
        q_out, s_out = shiftmax(q, scale, 8, mask=mask)
        p = np.asarray(q_out) * np.asarray(s_out)
        np.testing.assert_allclose(p[0, :2], 0.5, atol=0.02)
        np.testing.assert_allclose(p[0, 2:], 0.0, atol=1e-6)


class TestShiftGELU:
    def test_matches_gelu(self):
        x = np.linspace(-6, 6, 400, dtype=np.float32).reshape(4, 100)
        scale = np.float32(np.abs(x).max() / 127.0)
        q = jnp.asarray(_quant(x, scale))
        q_out, s_out = shiftgelu(q, scale, out_bits=8, interp=DEPLOY)
        got = np.asarray(q_out) * np.asarray(s_out)
        xs = np.asarray(q) * scale
        want = xs * (1.0 / (1.0 + np.exp(-1.702 * xs)))  # sigmoid-GELU oracle
        # 0.234 max error measured for a float64 transcription of the
        # reference IntGELU on this exact input — the band below is the
        # algorithm's own approximation quality, not ours.
        np.testing.assert_allclose(got, want, atol=0.3)
        assert np.abs(got - want).mean() < 0.05

    def test_sim_deploy_parity(self):
        rng = np.random.default_rng(7)
        x = rng.normal(0, 2, size=(4, 64)).astype(np.float32)
        scale = np.float32(0.04)
        q = jnp.asarray(_quant(x, scale))
        a, _ = shiftgelu(q, scale, 8, interp=DEPLOY)
        b, _ = shiftgelu(q, scale, 8, interp=SIM)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 2

    def test_grad_flows(self):
        scale = jnp.float32(0.04)

        def f(q):
            out, s = shiftgelu(q, scale, 8, interp=SIM)
            return jnp.sum(out * s)

        g = jax.grad(f)(jnp.asarray([[10.0, -5.0, 30.0, 0.0]]))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestIntLayerNorm:
    def test_matches_layernorm(self):
        rng = np.random.default_rng(8)
        d = 192
        x = rng.normal(1.5, 2.0, size=(2, 17, d)).astype(np.float32)
        scale = np.float32(np.abs(x).max() / (2**15 - 1))
        q = jnp.asarray(_quant(x, scale))
        gamma = jnp.asarray(rng.uniform(0.5, 1.5, size=(d,)).astype(np.float32))
        beta = jnp.asarray(rng.normal(0, 0.2, size=(d,)).astype(np.float32))
        q_out, s_out = int_layernorm(q, gamma, beta, DEPLOY)
        got = np.asarray(q_out) * np.asarray(s_out)

        xs = np.asarray(q) * scale
        mu = xs.mean(-1, keepdims=True)
        var = xs.var(-1, keepdims=True)
        want = (xs - mu) / np.sqrt(var + 1e-12) * np.asarray(gamma) + np.asarray(beta)
        np.testing.assert_allclose(got, want, atol=0.05, rtol=0.02)

    def test_output_scale_is_per_channel_gamma(self):
        d = 64
        q = jnp.asarray(np.random.default_rng(9).integers(-100, 100, (2, 3, d)).astype(np.float32))
        gamma = jnp.full((d,), 2.0)
        beta = jnp.zeros((d,))
        _, s_out = int_layernorm(q, gamma, beta, DEPLOY)
        assert s_out.shape == (d,)
        np.testing.assert_allclose(
            np.asarray(s_out), 2.0 * np.sqrt(d) / 2**30, rtol=1e-6
        )

    def test_gamma_gets_gradient_beta_does_not(self):
        # Reference: γ multiplies the live scale (grad flows); β enters
        # only via a detached integer bias (quant_modules.py:377-384).
        d = 32
        q = jnp.asarray(
            np.random.default_rng(10).integers(-2000, 2000, (4, d)).astype(np.float32)
        )

        def f(gamma, beta):
            q_out, s_out = int_layernorm(q, gamma, beta, SIM)
            return jnp.sum(q_out * s_out)

        g_gamma, g_beta = jax.grad(f, argnums=(0, 1))(
            jnp.ones((d,)), jnp.zeros((d,))
        )
        assert np.abs(np.asarray(g_gamma)).max() > 0
        np.testing.assert_array_equal(np.asarray(g_beta), np.zeros((d,)))

    def test_sim_deploy_parity(self):
        rng = np.random.default_rng(11)
        d = 128
        q = jnp.asarray(rng.integers(-(2**14), 2**14, (2, 5, d)).astype(np.float32))
        gamma = jnp.asarray(rng.uniform(0.8, 1.2, (d,)).astype(np.float32))
        beta = jnp.asarray(rng.normal(0, 0.1, (d,)).astype(np.float32))
        a, _ = int_layernorm(q, gamma, beta, DEPLOY)
        b, _ = int_layernorm(q, gamma, beta, SIM)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestShiftmaxIntDeploy:
    def test_bit_identical_to_f32_spec(self):
        """Int32-lane softmax == f32-carrier spec, bit for bit, across
        the admissible scale range (|x0| <= 512) incl. boundary-ish
        scales and degenerate uniform rows."""
        from ivit_tpu.ops import shiftmax_int_deploy

        rng = np.random.default_rng(0)
        q = rng.integers(-128, 128, (16, 197)).astype(np.float32)
        q[0] = 0.0          # uniform row
        q[1] = -128.0       # all-min row
        q[2, :100] = 127.0  # saturated block
        for scale in (1.0 / 512.0 + 1e-9, 0.004, 0.01, 0.03,
                      0.123456, 0.5, 0.999):
            qm = q - q.max(-1, keepdims=True)
            ref, s_ref = shiftmax(
                jnp.asarray(qm), jnp.float32(scale), out_bits=16,
                interp=DEPLOY,
            )
            out, s_out = shiftmax_int_deploy(
                jnp.asarray(q), jnp.float32(scale), out_bits=16
            )
            assert float(s_ref) == float(s_out)
            np.testing.assert_array_equal(
                np.asarray(out), np.asarray(ref),
                err_msg=f"scale={scale}",
            )

    def test_bit_identical_8bit(self):
        from ivit_tpu.ops import shiftmax_int_deploy

        rng = np.random.default_rng(1)
        q = rng.integers(-128, 128, (8, 49)).astype(np.float32)
        for scale in (0.01, 0.08, 0.31):
            qm = q - q.max(-1, keepdims=True)
            ref, _ = shiftmax(
                jnp.asarray(qm), jnp.float32(scale), out_bits=8,
                interp=DEPLOY,
            )
            out, _ = shiftmax_int_deploy(
                jnp.asarray(q), jnp.float32(scale), out_bits=8
            )
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestShiftgeluStableIntDeploy:
    def test_bit_identical_to_f32_spec(self):
        """Int32-lane stable GELU == f32-carrier stable spec, bit for
        bit, across the gated scale range — incl. all-negative, all-
        positive, zero and saturated inputs (the classes the guards /
        elisions care about)."""
        import math

        from ivit_tpu.ops import (
            gelu_int_lanes_valid,
            shiftgelu_stable_int_deploy,
        )

        rng = np.random.default_rng(2)
        q = rng.integers(-128, 128, (16, 384)).astype(np.float32)
        q[0] = 0.0
        q[1] = -128.0   # strongly negative block (the advisor's hazard)
        q[2] = 127.0
        q[3, :200] = -128.0
        for scale in (0.005, 0.01, 0.0292, 0.05, 0.123):
            p = int(-math.floor(-1.0 / (1.702 * scale)))
            assert gelu_int_lanes_valid(p), scale
            ref, s_ref = shiftgelu(
                jnp.asarray(q), jnp.float32(scale), out_bits=8,
                interp=DEPLOY, static_p=p, stable=True,
            )
            out, s_out = shiftgelu_stable_int_deploy(
                jnp.asarray(q), jnp.float32(scale), out_bits=8,
                static_p=p,
            )
            assert float(s_ref) == float(s_out)
            np.testing.assert_array_equal(
                np.asarray(out), np.asarray(ref),
                err_msg=f"scale={scale}",
            )

    def test_gate_rejects_large_p(self):
        from ivit_tpu.ops import gelu_int_lanes_valid

        assert not gelu_int_lanes_valid(None)
        assert not gelu_int_lanes_valid(3000)   # n*p^2 > 2^26
        assert gelu_int_lanes_valid(12)

    def test_bit_identical_jitted(self):
        """Same equality inside jit (the engine's context) — guards the
        claim that no XLA fusion changes either side's value."""
        import math

        from ivit_tpu.ops import shiftgelu_stable_int_deploy

        rng = np.random.default_rng(3)
        q = rng.integers(-128, 128, (4, 64, 128)).astype(np.float32)
        scale = 0.0173
        p = int(-math.floor(-1.0 / (1.702 * scale)))
        f = jax.jit(
            lambda x: shiftgelu(
                x, jnp.float32(scale), out_bits=8, interp=DEPLOY,
                static_p=p, stable=True,
            )[0]
        )
        g = jax.jit(
            lambda x: shiftgelu_stable_int_deploy(
                x, jnp.float32(scale), out_bits=8, static_p=p
            )[0]
        )
        np.testing.assert_array_equal(
            np.asarray(g(jnp.asarray(q))), np.asarray(f(jnp.asarray(q)))
        )


class TestStaticElisions:
    """static_p guard elisions are value-identical (bit-for-bit) to the
    full-guard spec over the whole int8 input domain and a scale sweep
    spanning every elision regime (clamp elided / kept, clip elided /
    kept, int32 sum / hi-lo sum)."""

    SCALES = (1.0 / 600.0, 1.0 / 320.0, 0.005, 0.0099, 0.02,
              0.0611, 0.13, 0.55, 0.97)

    def test_shiftmax_elisions_bit_identical(self):
        import math

        q8 = np.tile(np.arange(-128, 128, dtype=np.float32), (2, 1))
        rng = np.random.default_rng(2)
        rand = rng.integers(-128, 128, (6, 256)).astype(np.float32)
        q = jnp.asarray(np.concatenate([q8, rand]))
        for scale in self.SCALES:
            ref, _ = shiftmax(
                q, jnp.float32(scale), out_bits=16, interp=DEPLOY
            )
            fast, _ = shiftmax(
                q, jnp.float32(scale), out_bits=16, interp=DEPLOY,
                static_p=math.ceil(1.0 / scale),
            )
            np.testing.assert_array_equal(
                np.asarray(fast), np.asarray(ref), err_msg=f"s={scale}"
            )

    def test_shiftmax_packed_exp_bit_identical(self):
        """packed_exp hands the pass-boundary exp across HBM as a u16
        (k·4096 + m) instead of f32 — must stay bit-for-bit equal to
        the plain static_p path over the int8 domain, a p sweep
        crossing the clamp-elision boundary (p≈27) and the packing gate
        (p ≤ 2045), both output widths, and adversarial all-equal /
        all-extreme rows (which exercise the k = 0 packed-floor fold)."""
        import math

        q8 = np.tile(np.arange(-128, 128, dtype=np.float32), (2, 1))
        rng = np.random.default_rng(5)
        rand = rng.integers(-128, 128, (4, 197)).astype(np.float32)
        adversarial = np.concatenate([
            np.full((2, 197), -128.0, np.float32),
            np.zeros((2, 197), np.float32),
        ])
        for p in (5, 26, 27, 28, 331, 2045, 2046):
            scale = 1.0 / (p - 0.5)
            for q in (jnp.asarray(q8), jnp.asarray(rand),
                      jnp.asarray(adversarial)):
                for ob in (8, 16):
                    ref, _ = shiftmax(
                        q, jnp.float32(scale), out_bits=ob,
                        interp=DEPLOY, static_p=p,
                    )
                    fast, _ = shiftmax(
                        q, jnp.float32(scale), out_bits=ob,
                        interp=DEPLOY, static_p=p, packed_exp=True,
                    )
                    np.testing.assert_array_equal(
                        np.asarray(fast), np.asarray(ref),
                        err_msg=f"p={p} out_bits={ob}",
                    )

    def test_shiftmax_packed_gate_engages(self):
        """The bit-identity sweep above cannot tell a live packed path
        from a silently dead gate (both sides would then be the same
        computation) — pin that packed_exp actually emits the u16 pass
        boundary, and that the plain path never does."""
        import math

        import jax

        def trace(**kw):
            return str(jax.make_jaxpr(
                lambda x: shiftmax(
                    x, jnp.float32(1.0 / 330.5), out_bits=8,
                    interp=DEPLOY, static_p=331, **kw,
                )[0]
            )(jnp.zeros((4, 197), jnp.float32)))

        assert "u16" in trace(packed_exp=True)
        assert "u16" not in trace()
        # the gate must refuse a pre-masked (non-integral) input
        assert "u16" not in trace(packed_exp=True, in_lo=-math.inf)

    def test_shiftgelu_elisions_bit_identical(self):
        import math

        q8 = np.tile(np.arange(-128, 128, dtype=np.float32), (2, 1))
        rng = np.random.default_rng(3)
        rand = rng.integers(-128, 128, (6, 256)).astype(np.float32)
        q = jnp.asarray(np.concatenate([q8, rand]))
        for scale in self.SCALES:
            ref, _ = shiftgelu(
                q, jnp.float32(scale), out_bits=8, interp=DEPLOY
            )
            fast, _ = shiftgelu(
                q, jnp.float32(scale), out_bits=8, interp=DEPLOY,
                static_p=math.ceil(1.0 / (1.702 * scale)),
            )
            np.testing.assert_array_equal(
                np.asarray(fast), np.asarray(ref), err_msg=f"s={scale}"
            )

    def test_shiftgelu_all_negative_rows(self):
        """Advisor round-2 high: an all-negative row (q_max < 0) drives
        exp_max = shift-exp(−q_max) to the I32_MAX saturation, so the
        sum exceeds int32 and an elided upper clip would floor the
        normalizing factor to 0 (zeroing the whole row's GELU) where
        the guarded spec clips the sum and yields factor 1. The fixed
        elision (lower-bound-only) must stay bit-identical here too."""
        import math

        rows = []
        for lo, hi in ((-128, -120), (-80, -30), (-128, -1), (-50, -40)):
            rng = np.random.default_rng(abs(lo) + hi + 200)
            rows.append(rng.integers(lo, hi + 1, (3, 64)))
        rows.append(np.full((1, 64), -128))
        rows.append(np.full((1, 64), -1))
        q = jnp.asarray(np.concatenate(rows).astype(np.float32))
        for scale in self.SCALES:
            ref, _ = shiftgelu(
                q, jnp.float32(scale), out_bits=8, interp=DEPLOY
            )
            sim, _ = shiftgelu(
                q, jnp.float32(scale), out_bits=8, interp=SIM
            )
            fast, _ = shiftgelu(
                q, jnp.float32(scale), out_bits=8, interp=DEPLOY,
                static_p=math.ceil(1.0 / (1.702 * scale)),
            )
            np.testing.assert_array_equal(
                np.asarray(fast), np.asarray(ref), err_msg=f"s={scale}"
            )
            np.testing.assert_array_equal(
                np.asarray(fast), np.asarray(sim), err_msg=f"s={scale}"
            )
            # the data must actually exercise the hazard: the guarded
            # spec yields a NONZERO row here (factor clips to ≥ 1 and
            # the row-max element keeps sigmoid_int ≈ p/2), so the
            # factor-0 collapse of the old elision cannot hide as an
            # all-zero == all-zero match
            if scale <= 0.02:
                assert np.count_nonzero(np.asarray(ref)) > 0, scale


class TestLayerNormWideRows:
    """The d > 1000 stats fallback (vit_large's D=1024 exceeds the
    merged-accumulator int32 bound) must stay SIM/DEPLOY bit-identical
    and numerically a LayerNorm."""

    def test_wide_row_parity_and_value(self):
        rng = np.random.default_rng(7)
        for d in (1024, 1536):
            q = jnp.asarray(
                rng.integers(-(2**15), 2**15, (4, d)).astype(np.float32)
            )
            gamma = jnp.ones((d,))
            beta = jnp.zeros((d,))
            a, sa = int_layernorm(q, gamma, beta, DEPLOY)
            b, sb = int_layernorm(q, gamma, beta, SIM)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            y = np.asarray(a) * np.asarray(sa)
            x = np.asarray(q)
            ref = (x - x.mean(-1, keepdims=True)) / x.std(-1, keepdims=True)
            np.testing.assert_allclose(y, ref, atol=5e-3)


class TestShiftmaxWideRows:
    """Rows > 256 (e.g. a 384-resolution ViT's N=577) exceed the 2-limb
    exact-sum bound; the 3-limb split must keep SIM/DEPLOY/static_p
    bit-identical and still be a softmax."""

    def test_wide_row_parity_and_value(self):
        import math

        rng = np.random.default_rng(11)
        for n_row in (300, 577, 1024):
            q = jnp.asarray(
                rng.integers(-128, 128, (4, n_row)).astype(np.float32)
            )
            for scale in (1.0 / 320.0, 0.0099, 0.13):
                ref, s = shiftmax(
                    q, jnp.float32(scale), out_bits=16, interp=DEPLOY
                )
                sim, _ = shiftmax(
                    q, jnp.float32(scale), out_bits=16, interp=SIM
                )
                fast, _ = shiftmax(
                    q, jnp.float32(scale), out_bits=16, interp=DEPLOY,
                    static_p=math.ceil(1.0 / scale),
                )
                np.testing.assert_array_equal(np.asarray(sim), np.asarray(ref))
                np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))
                probs = np.asarray(ref, np.float64) * float(s)
                want = np.exp(np.asarray(q, np.float64) * scale)
                want = want / want.sum(-1, keepdims=True)
                assert np.abs(probs - want).max() < 0.03, (n_row, scale)


class TestShiftGeluStable:
    """Elementwise-stable ShiftGELU (ops/shiftgelu stable=True)."""

    def test_sim_deploy_and_elision_identical(self):
        rng = np.random.default_rng(0)
        q = rng.integers(-128, 128, (64, 96)).astype(np.float32)
        for s in (2.0**-4, 0.0308, 0.09):
            p = int(np.ceil(1.0 / (1.702 * s)))
            a, _ = shiftgelu(jnp.asarray(q), jnp.float32(s),
                             interp=DEPLOY, stable=True)
            b, _ = shiftgelu(jnp.asarray(q), jnp.float32(s),
                             interp=SIM, stable=True)
            c, _ = shiftgelu(jnp.asarray(q), jnp.float32(s),
                             interp=DEPLOY, stable=True, static_p=p)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_all_negative_rows(self):
        """Both exponents are <= 0 by construction — the rowmax form's
        all-negative-row saturation hazard cannot occur."""
        rng = np.random.default_rng(1)
        q = -rng.integers(40, 128, (8, 32)).astype(np.float32)
        s = 2.0**-4
        p = int(np.ceil(1.0 / (1.702 * s)))
        a, _ = shiftgelu(jnp.asarray(q), jnp.float32(s), interp=DEPLOY,
                         stable=True, static_p=p)
        b, _ = shiftgelu(jnp.asarray(q), jnp.float32(s), interp=SIM,
                         stable=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_float_proximity_beats_rowmax(self):
        """The per-element reference point keeps the approximation at
        least as tight as the row-max form at every tested scale (and
        strictly tighter at coarse scales, where row-max degrades)."""
        rng = np.random.default_rng(2)
        q = rng.integers(-128, 128, (64, 96)).astype(np.float32)
        for s in (2.0**-4, 0.0308, 0.09):
            x = q * s
            ref = x / (1.0 + np.exp(-1.702 * x))
            st, ss = shiftgelu(jnp.asarray(q), jnp.float32(s),
                               interp=DEPLOY, stable=True)
            rm, sr = shiftgelu(jnp.asarray(q), jnp.float32(s),
                               interp=DEPLOY, stable=False)
            err_st = np.abs(np.asarray(st) * float(ss) - ref).max()
            err_rm = np.abs(np.asarray(rm) * float(sr) - ref).max()
            assert err_st <= err_rm + 1e-6, (s, err_st, err_rm)
            assert err_st < 0.25, (s, err_st)

    def test_gradients_flow(self):
        q = jnp.asarray(
            np.random.default_rng(3).integers(-128, 128, (16, 32)),
            jnp.float32,
        )
        g = jax.grad(lambda x: jnp.sum(
            shiftgelu(x, jnp.float32(0.03), interp=SIM, stable=True)[0]
        ))(q)
        assert np.isfinite(np.asarray(g)).all()
