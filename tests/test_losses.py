"""Loss function tests (criterion selection parity, train_utils analogue)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.train.losses import (
    cross_entropy,
    distillation_loss,
    soft_target_cross_entropy,
    topk_accuracy,
)


class TestLosses:
    def test_ce_matches_soft_target_onehot(self):
        rng = jax.random.PRNGKey(0)
        logits = jax.random.normal(rng, (8, 10))
        labels = jax.random.randint(rng, (8,), 0, 10)
        hard = cross_entropy(logits, labels)
        soft = soft_target_cross_entropy(logits, jax.nn.one_hot(labels, 10))
        assert float(hard) == pytest.approx(float(soft), rel=1e-5)

    def test_smoothing_matches_timm_formula(self):
        rng = jax.random.PRNGKey(1)
        logits = jax.random.normal(rng, (8, 10))
        labels = jax.random.randint(rng, (8,), 0, 10)
        eps = 0.1
        ours = cross_entropy(logits, labels, smoothing=eps)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
        timm = (1 - eps) * nll + eps * (-logp.mean(-1))
        assert float(ours) == pytest.approx(float(timm.mean()), rel=1e-5)

    def test_distillation_none_passthrough(self):
        assert distillation_loss(None, 1.25, None, "none") == 1.25

    def test_distillation_soft_zero_when_equal(self):
        rng = jax.random.PRNGKey(2)
        logits = jax.random.normal(rng, (4, 10))
        base = 1.0
        out = distillation_loss(
            logits, base, teacher_logits=logits, kind="soft", alpha=0.5, tau=2.0
        )
        # KL(teacher || student) = 0 when identical → loss = base/2
        assert float(out) == pytest.approx(0.5, abs=1e-5)

    def test_distillation_hard(self):
        rng = jax.random.PRNGKey(3)
        s = jax.random.normal(rng, (4, 10))
        t = jax.random.normal(jax.random.PRNGKey(4), (4, 10))
        out = distillation_loss(s, 1.0, t, kind="hard", alpha=0.5)
        ref = 0.5 + 0.5 * cross_entropy(s, jnp.argmax(t, -1))
        assert float(out) == pytest.approx(float(ref), rel=1e-5)

    def test_topk(self):
        logits = jnp.asarray([[1.0, 2.0, 3.0], [3.0, 2.0, 1.0]])
        labels = jnp.asarray([2, 1])
        assert float(topk_accuracy(logits, labels, 1)) == 50.0
        assert float(topk_accuracy(logits, labels, 2)) == 100.0
