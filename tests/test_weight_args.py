"""Weight-as-arguments engine ≡ closure engine, bit-for-bit.

The wrapper (deploy/weight_args.py) lifts large artifact arrays into
jit arguments so vit_large-scale programs fit the remote-compile
relay's upload limit; the graph must be value-identical to the
closure-constant engine.
"""

import jax
import numpy as np
import pytest

from ivit_tpu.deploy import build_vit_infer, freeze_vit
from ivit_tpu.deploy.swin_engine import build_swin_infer, freeze_swin
from ivit_tpu.deploy.weight_args import build_infer_weight_args
from ivit_tpu.models import create_model
from ivit_tpu.models.swin import SwinTransformer
from ivit_tpu.models.vit import VisionTransformer


def _calibrated(model, x):
    variables = model.init(jax.random.PRNGKey(1), x, train=True)
    _, upd = model.apply(variables, x, train=True, mutable=["quant_stats"])
    return {"params": variables["params"], **upd}


def test_vit_weight_args_bitexact():
    model = VisionTransformer(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_classes=8, drop_path_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = _calibrated(model, x)
    artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
    ref = np.asarray(jax.jit(build_vit_infer(artifact, use_pallas=False))(x))
    got = np.asarray(
        build_infer_weight_args(artifact, build_vit_infer, use_pallas=False)(x)
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_swin_weight_args_bitexact():
    model = SwinTransformer(
        img_size=16, patch_size=2, num_classes=8, embed_dim=16,
        depths=(2, 2), num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    variables = _calibrated(model, x)
    artifact = freeze_swin(model, jax.tree.map(np.asarray, variables))
    ref = np.asarray(jax.jit(build_swin_infer(artifact, use_pallas=False))(x))
    got = np.asarray(
        build_infer_weight_args(artifact, build_swin_infer, use_pallas=False)(x)
    )
    np.testing.assert_array_equal(got, ref)
