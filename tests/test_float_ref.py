"""Float reference model: param-tree compatibility and INT8-vs-FP32
proximity — the framework-internal version of the reference's accuracy
comparison (README.md:44-56)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivit_tpu.models import VisionTransformer, create_model
from ivit_tpu.models.vit_float import (
    FloatVisionTransformer,
    quant_params_to_float,
)


def test_int8_sim_close_to_float_reference():
    qmodel = VisionTransformer(
        img_size=32, patch_size=8, num_classes=10,
        embed_dim=64, depth=2, num_heads=4,
    )
    fmodel = FloatVisionTransformer(
        img_size=32, patch_size=8, num_classes=10,
        embed_dim=64, depth=2, num_heads=4,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 32, 32, 3))
    variables = qmodel.init(jax.random.PRNGKey(1), x, train=True)
    # settle the EMA ranges a little
    for i in range(3):
        xi = jax.random.normal(jax.random.PRNGKey(10 + i), (8, 32, 32, 3))
        _, upd = qmodel.apply(variables, xi, train=True, mutable=["quant_stats"])
        variables = {"params": variables["params"], **upd}

    fparams = quant_params_to_float(variables["params"])
    f_logits = np.asarray(fmodel.apply({"params": fparams}, x))
    q_logits = np.asarray(qmodel.apply(variables, x))

    assert f_logits.shape == q_logits.shape
    # INT8 simulation tracks the float model: high logit correlation and
    # majority top-1 agreement (the paper's premise: ≤0.3% top-1 delta).
    corr = np.corrcoef(f_logits.ravel(), q_logits.ravel())[0, 1]
    assert corr > 0.95, corr
    agree = np.mean(np.argmax(f_logits, -1) == np.argmax(q_logits, -1))
    assert agree >= 0.75, agree


def test_fp32_registry_entries():
    m = create_model("deit_small_fp32")
    assert m.embed_dim == 384 and m.depth == 12
    m = create_model("swin_base_fp32")
    assert m.embed_dim == 128


@pytest.mark.slow
def test_swin_int8_sim_close_to_float_reference():
    from ivit_tpu.models import SwinTransformer
    from ivit_tpu.models.swin_float import (
        FloatSwinTransformer,
        swin_quant_params_to_float,
    )

    cfg = dict(img_size=16, patch_size=2, num_classes=10, embed_dim=16,
               depths=(2, 2), num_heads=(2, 4), window_size=4,
               drop_path_rate=0.0)
    qmodel = SwinTransformer(**cfg)
    fmodel = FloatSwinTransformer(**cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 16, 16, 3))
    variables = qmodel.init(jax.random.PRNGKey(1), x, train=True)
    for i in range(3):
        xi = jax.random.normal(jax.random.PRNGKey(10 + i), (4, 16, 16, 3))
        _, upd = qmodel.apply(variables, xi, train=True, mutable=["quant_stats"])
        variables = {"params": variables["params"], **upd}

    fparams = swin_quant_params_to_float(variables["params"])
    f_logits = np.asarray(fmodel.apply({"params": fparams}, x))
    q_logits = np.asarray(qmodel.apply(variables, x))
    corr = np.corrcoef(f_logits.ravel(), q_logits.ravel())[0, 1]
    assert corr > 0.9, corr
