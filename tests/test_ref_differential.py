"""Differential validation against the REFERENCE'S OWN executable code.

Every other oracle in this suite (C++ int64, int-lane twins) was written
by the same hand as the ops — a shared misreading of the reference would
pass them all. Here we import the reference's torch modules
(/root/reference/models/quantization_utils/, torch CPU) and drive them
with inputs identical to ours, asserting agreement modulo the explicit
catalogue below.

Complete catalogue of intentional divergence (everything NOT listed must
bit-match, and these tests pin that):

1. **quantize: reciprocal-multiply vs division.** The reference rounds
   ``1/s · x`` (quant_utils.py:48) — the f32 reciprocal rounds first.
   We round ``x / s`` (core/ste.quantize): on TPU XLA lowers division to
   reciprocal-multiply with device-specific tie behavior, so the repo
   pins all ratio math on-device instead (engine._scale); on CPU the
   two differ by ≤1 LSB at reciprocal-rounding boundaries. Exact
   agreement whenever 1/s is exactly representable (power-of-two
   scales) — asserted.
2. **Requant mantissa precision f32 vs f64 + tie rule.** The reference's
   ``fixedpoint_mul`` forms the ratio in float64, extracts a 31-bit
   mantissa with Decimal ROUND_HALF_UP, and rounds the product
   half-to-even **in float64** (quant_utils.py:150-253) — float64 does
   not exist on TPU. Our canonical mode multiplies by the f32 ratio and
   rounds half-to-even; our ``strict_dyadic`` mode extracts the 31-bit
   mantissa from the **f32** ratio (identical half-up rule; the f32
   frac makes the +0.5 a no-op) and rounds the exact 63-bit integer
   product half-away-from-zero. Both agree with the reference to ≤1 LSB
   (≤2 with a residual branch: two independent roundings), at
   boundary-density rates — asserted.
3. **Order of wide row sums.** The reference sums shift-exp rows with a
   plain f32 reduce whose rounding depends on torch's reduction order
   once partials pass 2^24; we use the order-independent exact split
   (ops/shiftmax._exact_sum_lastdim). Whenever the reference's sum is
   exact (row · p · 2^n < 2^24) the two bit-match — asserted; above
   that the reference's own result is reduction-order-defined and we
   assert ≤1 output LSB.
4. **Per-element exp saturation.** Our shift-exp clips each value to
   2^31−1 (real int32 lanes must); the reference lets f32 grow and
   clamps only the row sum (quant_modules.py:437,491). Downstream
   values still bit-match because both sums saturate identically —
   asserted on the all-negative-row GELU case (the round-2 advisor
   scenario).

Everything else — the shift-exp chain (both n=15 and n=23), IntSoftmax
at 8 and 16 bits, IntGELU, IntLayerNorm statistics/Newton/bias, EMA
range tracking, symmetric scale computation, per-channel weight
quantization, the int8 linear accumulator — is asserted BIT-EXACT
against the reference's executable implementation.

Reference: quant_modules.py:333-497, quant_utils.py:12-261.
"""

from __future__ import annotations

import functools
import math
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ivit_tpu.core.dyadic import dyadic_decompose
from ivit_tpu.core.quantizers import symmetric_scale, weight_scale
from ivit_tpu.core.ste import quantize
from ivit_tpu.ops import DEPLOY, int_layernorm, requantize, shiftgelu, shiftmax
from ivit_tpu.ops.shiftexp import int_exp_shift

_REF_PATH = "/root/reference/models"


@functools.lru_cache(maxsize=1)
def _ref():
    """Import the reference's quantization_utils with .cuda() neutralized.

    The reference hardcodes .cuda() on tensors (quant_utils.py:88,
    quant_modules.py:356,440,494); on this CPU-only torch the method is
    patched to identity for the test process.
    """
    torch.Tensor.cuda = lambda self, *a, **k: self
    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    from quantization_utils import quant_modules, quant_utils  # noqa

    return quant_modules, quant_utils


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


# ---------------------------------------------------------------- shift-exp


@pytest.mark.parametrize("n,scale", [
    (15, 0.0308), (15, 0.0023), (15, 0.25),
    # n=23 scales keep p·2^23 < 2^31 (p < 256) — the reference's f32
    # grows past int32 above that while real int32 lanes must saturate
    # (catalogue #4); deploy gating enforces the same bound.
    (23, 0.0308 * 1.702), (23, 0.0044), (23, 0.12),
])
def test_int_exp_shift_bit_exact(n, scale):
    """The inner shift-exp chain, arbitrary scales, nonpositive inputs."""
    qm, _ = _ref()
    mod = qm.IntSoftmax(16) if n == 15 else qm.IntGELU(8)
    rng = np.random.default_rng(n)
    q = -rng.integers(0, 700, size=(64, 37)).astype(np.float32)

    ref_exp, ref_s = mod.int_exp_shift(_t(q), _t(scale))
    our_exp, our_s = int_exp_shift(jnp.asarray(q), jnp.float32(scale), n, DEPLOY)

    np.testing.assert_array_equal(np.asarray(our_exp), ref_exp.numpy())
    np.testing.assert_array_equal(
        np.float32(our_s), np.float32(ref_s.numpy())
    )


# ---------------------------------------------------------------- softmax


@pytest.mark.parametrize("out_bits", [8, 16])
def test_shiftmax_forward_bit_exact(out_bits):
    """Full IntSoftmax forward. p·2^15·N < 2^24 keeps the reference's f32
    row sum exact, so the comparison is bit-for-bit (catalogue #3)."""
    qm, _ = _ref()
    ref_sm = qm.IntSoftmax(output_bit=out_bits)
    s = np.float32(2.0**-4)  # p = 16; 16·2^15·32 = 2^24 boundary-exact
    rng = np.random.default_rng(out_bits)
    q = rng.integers(-128, 128, size=(6, 4, 31, 31)).astype(np.float32)

    ref_out, ref_s = ref_sm(_t(q * s), _t(s))
    ref_int = ref_out.numpy() / ref_s.numpy()  # exact: scale = 2^-(b-1)

    our_int, our_s = shiftmax(jnp.asarray(q), s, out_bits=out_bits, interp=DEPLOY)
    np.testing.assert_array_equal(np.asarray(our_int), ref_int)
    assert np.float32(our_s) == np.float32(ref_s.numpy())


def test_shiftmax_long_row_within_1lsb():
    """N=197 at p=64: the reference's f32 row sum passes 2^24 and rounds
    in torch's reduction order; our exact split diverges by at most one
    LSB of the 16-bit probabilities (catalogue #3)."""
    qm, _ = _ref()
    ref_sm = qm.IntSoftmax(output_bit=16)
    s = np.float32(2.0**-6)
    rng = np.random.default_rng(3)
    q = rng.integers(-128, 128, size=(8, 197)).astype(np.float32)

    ref_out, ref_s = ref_sm(_t(q * s), _t(s))
    ref_int = ref_out.numpy() / ref_s.numpy()
    our_int, _ = shiftmax(jnp.asarray(q), s, out_bits=16, interp=DEPLOY)
    assert np.max(np.abs(np.asarray(our_int) - ref_int)) <= 1


# ---------------------------------------------------------------- gelu


def test_shiftgelu_forward_bit_exact():
    """Full IntGELU forward. The two-term sum is a single f32 add in both
    implementations, so even past 2^24 the rounding is identical."""
    qm, _ = _ref()
    ref_g = qm.IntGELU(output_bit=8)
    s = np.float32(2.0**-4)
    rng = np.random.default_rng(7)
    q = rng.integers(-128, 128, size=(4, 13, 64)).astype(np.float32)

    ref_out, ref_s = ref_g(_t(q * s), _t(s))
    our_q, our_s = shiftgelu(jnp.asarray(q), s, out_bits=8, interp=DEPLOY)
    our_out = np.float32(np.asarray(our_q)) * np.float32(np.asarray(our_s))
    np.testing.assert_array_equal(our_out, ref_out.numpy())
    assert np.float32(np.asarray(our_s)) == np.float32(ref_s.numpy())


def test_shiftgelu_all_negative_row_bit_exact():
    """The round-2 advisor scenario: q_max < 0 makes exp(−q_max) blow up.
    Our per-element I32 clip and the reference's sum-only clamp saturate
    to the same factor (catalogue #4) — the outputs still bit-match."""
    qm, _ = _ref()
    ref_g = qm.IntGELU(output_bit=8)
    s = np.float32(2.0**-4)
    rng = np.random.default_rng(11)
    q = -rng.integers(40, 128, size=(3, 5, 64)).astype(np.float32)

    ref_out, _ = ref_g(_t(q * s), _t(s))
    our_q, our_s = shiftgelu(jnp.asarray(q), s, out_bits=8, interp=DEPLOY)
    our_out = np.float32(np.asarray(our_q)) * np.float32(np.asarray(our_s))
    np.testing.assert_array_equal(our_out, ref_out.numpy())


# ---------------------------------------------------------------- layernorm


def test_int_layernorm_bit_exact():
    qm, _ = _ref()
    d = 64
    ref_ln = qm.IntLayerNorm(d)
    gamma = np.random.default_rng(1).normal(1.0, 0.1, d).astype(np.float32)
    beta = np.random.default_rng(2).normal(0.0, 0.2, d).astype(np.float32)
    with torch.no_grad():
        ref_ln.weight.copy_(_t(gamma))
        ref_ln.bias.copy_(_t(beta))

    s = np.float32(2.0**-7)
    q = np.random.default_rng(4).integers(-127, 128, (2, 9, d)).astype(np.float32)

    ref_out, ref_s = ref_ln(_t(q * s), _t(s))
    our_q, our_s = int_layernorm(
        jnp.asarray(q), jnp.asarray(gamma), jnp.asarray(beta), interp=DEPLOY
    )
    our_out = np.float32(np.asarray(our_q)) * np.float32(np.asarray(our_s))
    np.testing.assert_array_equal(our_out, ref_out.detach().numpy())
    np.testing.assert_array_equal(
        np.float32(np.asarray(our_s)), ref_s.detach().numpy()
    )


# ---------------------------------------------------------------- requant


def _ref_fixedpoint(z, s_in, s_out, bits, id_z=None, id_s=None):
    qm, qu = _ref()
    pre = _t((z * s_in)[None])  # reference reshape needs ndim >= 2
    args = [pre, _t(s_in), bits, "symmetric", _t(s_out)]
    if id_z is not None:
        args += [_t((id_z * id_s)[None]), _t(id_s)]
    return qu.fixedpoint_mul.apply(*args).numpy()[0]


@pytest.mark.parametrize("strict", [False, True])
def test_fixedpoint_mul_within_1lsb(strict):
    """Canonical f32-ratio AND strict 16-limb dyadic vs the reference's
    float64 dyadic: ≤1 LSB at boundary-density rates (catalogue #2)."""
    rng = np.random.default_rng(5)
    z = rng.integers(-30000, 30000, size=(4096,)).astype(np.float32)
    s_in, s_out = np.float32(2.0**-8), np.float32(0.0036913)

    ref = _ref_fixedpoint(z, s_in, s_out, 16)
    ours = np.asarray(requantize(
        jnp.asarray(z), s_in, s_out, 16, interp=DEPLOY, strict_dyadic=strict
    ))
    diff = np.abs(ours - ref)
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01, (diff > 0).mean()


def test_fixedpoint_mul_residual_within_2lsb():
    rng = np.random.default_rng(6)
    z = rng.integers(-30000, 30000, size=(2048,)).astype(np.float32)
    idz = rng.integers(-30000, 30000, size=(2048,)).astype(np.float32)
    s_in, s_out, s_id = np.float32(2.0**-8), np.float32(0.0041), np.float32(2.0**-9)

    ref = _ref_fixedpoint(z, s_in, s_out, 16, idz, s_id)
    ours = np.asarray(requantize(
        jnp.asarray(z), s_in, s_out, 16,
        identity_q=jnp.asarray(idz), identity_scale=s_id, interp=DEPLOY,
    ))
    diff = np.abs(ours - ref)
    assert diff.max() <= 2
    assert (diff > 0).mean() < 0.02


def test_dyadic_mantissa_matches_reference_frexp():
    """Our jit-able decompose reproduces the reference's numpy-frexp +
    Decimal ROUND_HALF_UP mantissa whenever the ratio is f32 (the only
    precision a TPU scale can be) — same m, same e."""
    _, qu = _ref()
    ratios = np.float32([0.0036913, 0.25, 1.7, 0.00012207, 123.456])
    # float64 container with f32 values: the reference's Decimal path
    # requires doubles (its fixedpoint_mul always passes doubles; numpy
    # 2.x rejects Decimal(float32)); the frac of an f32 value is the
    # same in either width so the comparison stays exact.
    m_ref, e_ref = qu.batch_frexp(_t(ratios).double())
    m_our, e_our = dyadic_decompose(jnp.asarray(ratios))
    np.testing.assert_array_equal(np.asarray(m_our), m_ref.numpy())
    np.testing.assert_array_equal(
        np.asarray(e_our, np.float64), e_ref.numpy()
    )


# ---------------------------------------------------------------- quantize


def test_symmetric_quant_pow2_scale_bit_exact():
    """With 1/s exactly representable the reciprocal-multiply and the
    division agree bit-for-bit (catalogue #1, exact branch)."""
    _, qu = _ref()
    x = np.random.default_rng(8).normal(0, 1, (512,)).astype(np.float32)
    s = np.float32(2.0**-6)
    ref = qu.SymmetricQuantFunction.apply(_t(x[None]), 8, _t(s), False).numpy()[0]
    ours = np.asarray(quantize(jnp.asarray(x), s, 8))
    np.testing.assert_array_equal(ours, ref)


def test_symmetric_quant_general_scale_within_1lsb():
    _, qu = _ref()
    x = np.random.default_rng(9).normal(0, 1, (8192,)).astype(np.float32)
    s = np.float32(0.00731)
    ref = qu.SymmetricQuantFunction.apply(_t(x[None]), 8, _t(s), False).numpy()[0]
    ours = np.asarray(quantize(jnp.asarray(x), s, 8))
    diff = np.abs(ours - ref)
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.001  # reciprocal-rounding boundary density


def test_symmetric_scale_bit_exact():
    _, qu = _ref()
    mn = np.float32([-0.31, -1.7, 0.0, -0.004])
    mx = np.float32([0.29, 2.1, 0.0, 0.0039])
    ref = qu.symmetric_linear_quantization_params(8, _t(mn), _t(mx)).numpy()
    ours = np.asarray(symmetric_scale(jnp.asarray(mn), jnp.asarray(mx), 8))
    np.testing.assert_array_equal(ours, ref)


# ---------------------------------------------------------------- linear


def test_quant_linear_bit_exact_at_exact_scales():
    """Per-channel weight quantization + integer accumulator vs the
    reference QuantLinear. Weights are scaled so each channel's max-abs
    is 127·2^-k → both sides compute scale 2^-k exactly, the ±1 LSB
    quantize delta (catalogue #1) vanishes, and the int32 accumulators
    must agree bit-for-bit."""
    qm, _ = _ref()
    rng = np.random.default_rng(10)
    cin, cout, b = 48, 32, 16
    w = rng.normal(0, 1, (cout, cin)).astype(np.float32)
    w = w / np.abs(w).max(axis=1, keepdims=True) * 127.0 * 2.0**-9
    bias = rng.normal(0, 1, cout).astype(np.float32) * 2.0**-8
    x_int = rng.integers(-128, 128, (b, cin)).astype(np.float32)
    s_act = np.float32(2.0**-5)

    ref_fc = qm.QuantLinear(cin, cout)
    with torch.no_grad():
        ref_fc.weight.copy_(_t(w))
        ref_fc.bias.copy_(_t(bias))
    ref_out, ref_s = ref_fc(_t(x_int * s_act), _t(s_act))
    ref_acc = ref_out.detach().numpy() / ref_s.detach().numpy()

    w_scale = weight_scale(jnp.asarray(w), 8)
    np.testing.assert_array_equal(
        np.asarray(w_scale), ref_fc.fc_scaling_factor.numpy()
    )
    w_int = np.asarray(quantize(jnp.asarray(w.T), w_scale[None, :], 8))
    np.testing.assert_array_equal(
        w_int.T, ref_fc.weight_integer.detach().numpy()
    )
    b_int = np.asarray(quantize(
        jnp.asarray(bias), w_scale * s_act, 32
    ))
    np.testing.assert_array_equal(b_int, ref_fc.bias_integer.detach().numpy())
    acc = x_int @ w_int + b_int  # exact: fits f64 integers
    np.testing.assert_array_equal(acc, ref_acc)


# ---------------------------------------------------------------- quantact


def test_quantact_ema_stats_bit_exact():
    """EMA range tracking (momentum 0.95, first-batch sentinel) over 4
    batches: running min/max and the resulting scale must bit-match."""
    qm, _ = _ref()
    from ivit_tpu.nn.quant import QuantAct

    ref_act = qm.QuantAct(activation_bit=8)
    our_act = QuantAct(bits=8)
    xs = [
        np.random.default_rng(20 + i).normal(0, 1 + 0.2 * i, (4, 6, 16))
        .astype(np.float32)
        for i in range(4)
    ]
    variables = our_act.init(jax.random.PRNGKey(0), xs[0], update_stats=True)
    stats = {"quant_stats": variables["quant_stats"]}
    for i, x in enumerate(xs):
        ref_act(_t(x))
        if i == 0:
            continue
        _, upd = our_act.apply(
            {"params": variables.get("params", {}), **stats},
            x, update_stats=True, mutable=["quant_stats"],
        )
        stats = upd
    ours_min = float(jax.tree.leaves(stats)[1])  # max_val, min_val sorted
    ours_max = float(jax.tree.leaves(stats)[0])
    got = sorted([ours_min, ours_max])
    want = sorted([float(ref_act.min_val), float(ref_act.max_val)])
    np.testing.assert_array_equal(np.float32(got), np.float32(want))
    ref_scale = np.float32(ref_act.act_scaling_factor.numpy())
    our_scale = np.float32(np.asarray(symmetric_scale(
        jnp.float32(got[0]), jnp.float32(got[1]), 8
    )))
    assert our_scale == ref_scale
