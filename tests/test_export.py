"""Serialized compiled-engine round trip (deploy/export.py).

The analogue of the reference's compiled-GraphModule product: the
exported StableHLO bytes must reload (no model-building code, only jax)
and reproduce the live engine's logits bit-for-bit.
"""

import jax
import numpy as np

from ivit_tpu.deploy import (
    build_vit_infer,
    export_engine,
    freeze_vit,
    load_engine,
)
from ivit_tpu.models import VisionTransformer


def test_export_roundtrip_bit_identical(tmp_path):
    model = VisionTransformer(
        img_size=16, patch_size=8, num_classes=8,
        embed_dim=32, depth=2, num_heads=4,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x, train=True)
    artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))

    infer = build_vit_infer(artifact, use_pallas=False)
    live = np.asarray(jax.jit(infer)(x))

    path = str(tmp_path / "engine.stablehlo")
    data = export_engine(infer, batch_size=4, img_size=16, path=path)
    assert len(data) > 1000

    loaded = load_engine(path)
    np.testing.assert_array_equal(np.asarray(loaded(x)), live)
