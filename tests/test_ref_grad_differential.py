"""GRADIENT differential vs the reference's own autograd.

test_ref_differential pins the FORWARD of every integer op against the
reference's executable torch modules; QAT fidelity equally depends on
the BACKWARD — the STE conventions (grad/scale through quantize,
unconditional pass-through clips, identity floors, ln2·2^k through the
shift-exp power) are what make the published accuracy recipe train.
Here torch autograd runs the reference ops and jax.grad runs our SIM
interpreter on identical inputs; the gradients must agree.

Convention note: the reference ops consume the FLOAT activation
``x = q·s`` and differentiate w.r.t. x; our ops consume the integer
carrier ``q`` at scale ``s``. Chain rule: ``dL/dq = dL/dx · s``, so
every comparison converts with one exact multiply by ``s``.

Reference backwards: SymmetricQuantFunction (quant_utils.py:99-119,
grad/scale — unconditional, even for clipped values), floor/round STE
(:132-147, identity), fixedpoint_mul (:256-261, grad/output-scale on
both the main and the identity branch), and plain autograd through the
STE'd shift-exp chains of IntSoftmax/IntGELU/IntLayerNorm
(quant_modules.py:333-497).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ivit_tpu.core.ste import quantize
from ivit_tpu.ops import SIM, int_layernorm, requantize, shiftgelu, shiftmax
from tests.test_ref_differential import _ref, _t


def _torch_grad(out, wrt, w):
    """dL/d(wrt) for L = Σ w·out."""
    loss = (out * torch.from_numpy(w)).sum()
    loss.backward()
    return [t.grad.numpy() for t in wrt]


# ---------------------------------------------------------------- quantize


def test_quantize_ste_grad_is_w_over_scale_everywhere():
    """grad = upstream/scale with NO clip masking: values far outside
    the int8 range still receive full gradient (quant_utils.py:99-119 —
    the reference's STE never gates on the clamp)."""
    qm, qu = _ref()
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(4, 33)) * 12.0).astype(np.float32)  # mostly clipped
    s = np.float32(0.037)
    w = rng.normal(size=x.shape).astype(np.float32)

    xt = torch.from_numpy(x.copy()).requires_grad_(True)
    out = qu.SymmetricQuantFunction.apply(xt, 8, _t(s), False)
    (g_ref,) = _torch_grad(out, [xt], w)

    g_our = np.asarray(jax.grad(
        lambda v: jnp.sum(quantize(v, jnp.float32(s), 8) * w)
    )(jnp.asarray(x)))

    np.testing.assert_allclose(g_our, g_ref, rtol=1e-6)
    np.testing.assert_allclose(g_ref, w / s, rtol=1e-6)


# ---------------------------------------------------------------- requant


@pytest.mark.parametrize("with_identity", [False, True])
def test_fixedpoint_mul_grad(with_identity):
    """Both branches of the requant STE: grad = upstream/output-scale
    (quant_utils.py:256-261), identically in our requantize."""
    qm, qu = _ref()
    rng = np.random.default_rng(1)
    z = rng.integers(-30000, 30000, size=(1, 512)).astype(np.float32)
    s_in, s_out = np.float32(2.0**-8), np.float32(0.0036913)
    w = rng.normal(size=z.shape).astype(np.float32)
    idz = rng.integers(-30000, 30000, size=z.shape).astype(np.float32)
    s_id = np.float32(2.0**-9)

    xt = torch.from_numpy(z * s_in).requires_grad_(True)
    args = [xt, _t(s_in), 16, "symmetric", _t(s_out)]
    idt = None
    if with_identity:
        idt = torch.from_numpy(idz * s_id).requires_grad_(True)
        args += [idt, _t(s_id)]
    out = qu.fixedpoint_mul.apply(*args)
    wrt = [xt] + ([idt] if with_identity else [])
    g_ref = _torch_grad(out, wrt, w)

    def f(q, iq):
        kw = {}
        if with_identity:
            kw = dict(identity_q=iq, identity_scale=jnp.float32(s_id))
        return jnp.sum(
            requantize(q, jnp.float32(s_in), jnp.float32(s_out), 16,
                       interp=SIM, **kw) * w
        )

    gq, gi = jax.grad(f, argnums=(0, 1))(jnp.asarray(z), jnp.asarray(idz))
    # ours is w.r.t. the carrier: dL/dx = dL/dq / s
    np.testing.assert_allclose(np.asarray(gq) / s_in, g_ref[0], rtol=1e-6)
    if with_identity:
        np.testing.assert_allclose(
            np.asarray(gi) / s_id, g_ref[1], rtol=1e-6
        )


# ---------------------------------------------------------------- softmax


@pytest.mark.parametrize("out_bits", [8, 16])
def test_shiftmax_grad(out_bits):
    """Autograd through the full IntSoftmax STE chain (shift-exp with
    ln2·2^k through the power, pass-through floors, 1/x0 through the
    quotient) — the reference's quant_modules.py:448-497 backward."""
    qm, _ = _ref()
    ref_sm = qm.IntSoftmax(output_bit=out_bits)
    s = np.float32(2.0**-4)
    rng = np.random.default_rng(out_bits)
    q = rng.integers(-128, 128, size=(3, 5, 31)).astype(np.float32)
    w = rng.normal(size=q.shape).astype(np.float32)

    xt = torch.from_numpy(q * s).requires_grad_(True)
    out, _ = ref_sm(xt, _t(s))
    (g_ref,) = _torch_grad(out, [xt], w)

    def f(qv):
        oq, osc = shiftmax(qv, jnp.float32(s), out_bits=out_bits,
                           interp=SIM)
        return jnp.sum(oq * osc * w)

    g_our = np.asarray(jax.grad(f)(jnp.asarray(q))) / s
    np.testing.assert_allclose(g_our, g_ref, rtol=2e-5, atol=1e-7)


# ---------------------------------------------------------------- gelu


def test_shiftgelu_grad():
    qm, _ = _ref()
    ref_g = qm.IntGELU(output_bit=8)
    s = np.float32(2.0**-4)
    rng = np.random.default_rng(7)
    q = rng.integers(-128, 128, size=(4, 9, 32)).astype(np.float32)
    w = rng.normal(size=q.shape).astype(np.float32)

    xt = torch.from_numpy(q * s).requires_grad_(True)
    out, _ = ref_g(xt, _t(s))
    (g_ref,) = _torch_grad(out, [xt], w)

    def f(qv):
        oq, osc = shiftgelu(qv, jnp.float32(s), out_bits=8, interp=SIM)
        return jnp.sum(oq * osc * w)

    g_our = np.asarray(jax.grad(f)(jnp.asarray(q))) / s

    # The row-max element's gradient accumulates a term from every
    # other element (it enters each sigmoid via x − max), with two
    # legitimate divergences: (a) at TIED maxima torch routes the max
    # subgradient to the first argmax while jax splits it evenly — the
    # per-row SUM over tied positions is what is well-defined; (b) the
    # unique-max accumulation orders f32 adds differently (~1e-6 rel).
    is_max = q == q.max(-1, keepdims=True)
    np.testing.assert_allclose(
        g_our[~is_max], g_ref[~is_max], rtol=2e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.where(is_max, g_our, 0).sum(-1),
        np.where(is_max, g_ref, 0).sum(-1),
        rtol=1e-4, atol=1e-6,
    )


# ---------------------------------------------------------------- layernorm


def test_int_layernorm_grads():
    """dx through the STE mean/var path, dγ through the live scale
    multiply, dβ detached-to-int-bias (quant_modules.py:359-386: the
    reference likewise multiplies the LIVE weight into the output and
    detaches the bias integerization)."""
    qm, _ = _ref()
    d = 64
    ref_ln = qm.IntLayerNorm(d)
    rng = np.random.default_rng(3)
    gamma = rng.normal(1.0, 0.1, d).astype(np.float32)
    beta = rng.normal(0.0, 0.2, d).astype(np.float32)
    with torch.no_grad():
        ref_ln.weight.copy_(_t(gamma))
        ref_ln.bias.copy_(_t(beta))

    s = np.float32(2.0**-7)
    q = rng.integers(-127, 128, (2, 9, d)).astype(np.float32)
    w = rng.normal(size=q.shape).astype(np.float32)

    xt = torch.from_numpy(q * s).requires_grad_(True)
    out, _ = ref_ln(xt, _t(s))
    g_ref_x, g_ref_gamma = _torch_grad(
        out, [xt, ref_ln.weight], w
    )
    # β is FULLY detached in the reference (`self.bias.data.detach()`,
    # quant_modules.py:378) — its torch grad is None.
    assert ref_ln.bias.grad is None

    def f(qv, gv, bv):
        oq, osc = int_layernorm(qv, gv, bv, interp=SIM)
        return jnp.sum(oq * osc * w)

    gq, gg, gb = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(gamma), jnp.asarray(beta)
    )
    np.testing.assert_allclose(np.asarray(gq) / s, g_ref_x,
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gg), g_ref_gamma,
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(gb), 0.0)


# ---------------------------------------------------------------- linear


def test_quant_linear_module_grads():
    """Module-level: per-out-channel weight-quantize STE (scale computed
    under no_grad — DETACHED), bias STE at w_scale·s_in, x/s chain
    (quant_modules.py:12-97). dx, dW, db must all match the reference's
    autograd."""
    qm, _ = _ref()
    rng = np.random.default_rng(9)
    in_f, out_f = 24, 16
    W = rng.normal(0, 0.3, (out_f, in_f)).astype(np.float32)
    b = rng.normal(0, 0.1, out_f).astype(np.float32)
    s = np.float32(2.0**-5)
    q = rng.integers(-128, 128, (5, in_f)).astype(np.float32)
    w_mask = rng.normal(size=(5, out_f)).astype(np.float32)

    ref_fc = qm.QuantLinear(in_f, out_f)
    with torch.no_grad():
        ref_fc.weight.copy_(torch.from_numpy(W))
        ref_fc.bias.copy_(torch.from_numpy(b))
    xt = torch.from_numpy(q * s).requires_grad_(True)
    out, _ = ref_fc(xt, _t(s))
    g_ref_x, g_ref_w, g_ref_b = _torch_grad(
        out, [xt, ref_fc.weight, ref_fc.bias], w_mask
    )

    from ivit_tpu.core.qtensor import QTensor
    from ivit_tpu.nn.quant import QuantLinear

    model = QuantLinear(out_f)
    variables = model.init(
        jax.random.PRNGKey(0),
        QTensor(q=jnp.asarray(q), scale=jnp.float32(s), bits=8),
    )
    params = {"kernel": jnp.asarray(W.T), "bias": jnp.asarray(b)}

    def f(p, qv):
        out = model.apply(
            {"params": p}, QTensor(q=qv, scale=jnp.float32(s), bits=8)
        )
        return jnp.sum(out.q * out.scale * w_mask)

    gp, gq = jax.grad(f, argnums=(0, 1))(params, jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(gq) / s, g_ref_x,
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gp["kernel"]).T, g_ref_w,
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gp["bias"]), g_ref_b,
                               rtol=2e-5, atol=1e-7)
