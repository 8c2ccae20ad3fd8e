"""model_utils: eval variable selection + scale artifact inspection."""

import jax
import numpy as np
import optax

from ivit_tpu.models import VisionTransformer
from ivit_tpu.models.model_utils import eval_variables, scale_report
from ivit_tpu.train import create_train_state


def test_eval_variables_and_scale_report():
    model = VisionTransformer(
        img_size=16, patch_size=8, num_classes=8,
        embed_dim=32, depth=1, num_heads=4,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    state = create_train_state(
        model, rng, x, optax.adamw(1e-3), ema_decay=0.9
    )

    v = eval_variables(state)
    assert v["params"] is state.ema_params
    v = eval_variables(state, use_ema=False)
    assert v["params"] is state.params

    # populate stats then inspect
    _, upd = model.apply(
        {"params": state.params, "quant_stats": state.quant_stats},
        x, train=True, mutable=["quant_stats"],
    )
    report = scale_report({"quant_stats": upd["quant_stats"]})
    assert any("qact_input" in k for k in report)
    for mod, (mn, mx, s) in report.items():
        assert mx >= mn and s > 0


def test_create_train_state_stats_start_at_sentinel():
    """Fresh TrainState quant_stats must be all-zero (the reference's
    min==max sentinel, quant_modules.py:177-187) so the FIRST real
    calibration batch assigns ranges directly. Init used to run the
    dummy sample with stat updates on, seeding every EMA with
    init-weight activations of a zeros batch — exposed by the
    model-level differential (test_ref_model_differential)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ivit_tpu.models import VisionTransformer
    from ivit_tpu.train import create_train_state

    model = VisionTransformer(
        img_size=16, patch_size=8, num_classes=8,
        embed_dim=32, depth=1, num_heads=4,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((2, 16, 16, 3)), optax.sgd(0.1),
    )
    leaves = jax.tree.leaves(state.quant_stats)
    assert leaves, "quant model must carry quant_stats"
    assert all(float(np.max(np.abs(v))) == 0.0 for v in leaves)
