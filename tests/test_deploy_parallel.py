"""Data-parallel deployment: sharded engine inference over a mesh.

The serving-scale capability the reference's TVM path never had (it
hard-asserts single-GPU batch 1, build_model.py:59-60): the int8 engine
jitted over a ``(data,)`` mesh must produce logits bit-identical to
single-device execution — per-example integer compute is untouched by
the sharding, so any deviation is a sharding bug.

Runs on the virtual 8-CPU mesh (conftest env).
"""

import jax
import numpy as np
import pytest

from ivit_tpu.deploy import build_vit_infer, freeze_vit
from ivit_tpu.deploy.swin_engine import build_swin_infer, freeze_swin
from ivit_tpu.models import VisionTransformer
from ivit_tpu.models.swin import SwinTransformer
from ivit_tpu.parallel import make_mesh, shard_infer


@pytest.mark.slow
def test_dp_sharded_vit_engine_bit_identical():
    model = VisionTransformer(
        img_size=16, patch_size=8, num_classes=8,
        embed_dim=32, depth=2, num_heads=4,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x[:2], train=True)
    artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))

    infer = build_vit_infer(artifact, use_pallas=False)
    single = np.asarray(jax.jit(infer)(x))

    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    sharded = np.asarray(shard_infer(infer, mesh)(x))
    np.testing.assert_array_equal(single, sharded)


@pytest.mark.slow
def test_dp_sharded_swin_engine_bit_identical():
    model = SwinTransformer(
        img_size=16, patch_size=2, num_classes=8, embed_dim=16,
        depths=(2, 2), num_heads=(2, 4), window_size=4,
        drop_path_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x[:2], train=True)
    artifact = freeze_swin(model, jax.tree.map(np.asarray, variables))

    infer = build_swin_infer(artifact, use_pallas=False)
    single = np.asarray(jax.jit(infer)(x))

    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    sharded = np.asarray(shard_infer(infer, mesh)(x))
    np.testing.assert_array_equal(single, sharded)


def _per_chip_weight_bytes(artifact, mesh):
    """Max over chips of the TP-threaded weight bytes actually resident."""
    from ivit_tpu.parallel import tp_weight_shardings

    _, weights, shardings = tp_weight_shardings(artifact, mesh)
    placed = jax.device_put(weights, shardings)
    per = {}
    for arr in placed:
        for s in arr.addressable_shards:
            per[s.device] = per.get(s.device, 0) + s.data.nbytes
    return max(per.values())


@pytest.mark.slow
def test_tp_sharded_vit_engine_bit_identical():
    """Model-axis (TP) serving: Megatron-sharded engine weights, logits
    bit-identical to single-device (integer reductions are exact), and
    the per-chip weight footprint actually shrinks by ~the TP degree."""
    from ivit_tpu.parallel import shard_infer_tp

    model = VisionTransformer(
        img_size=16, patch_size=8, num_classes=8,
        embed_dim=32, depth=2, num_heads=4,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x[:2], train=True)
    artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))

    single = np.asarray(jax.jit(build_vit_infer(artifact, use_pallas=False))(x))

    # pure TP (data=1) and composed DPxTP on the same 8 devices
    for data, tp in ((1, 8), (2, 4)):
        mesh = make_mesh(data=data, model=tp, devices=jax.devices()[:8])
        logits = np.asarray(
            shard_infer_tp(artifact, mesh, use_pallas=False)(x)
        )
        np.testing.assert_array_equal(single, logits)

    rep = _per_chip_weight_bytes(
        artifact, make_mesh(data=8, model=1, devices=jax.devices()[:8])
    )
    tp8 = _per_chip_weight_bytes(
        artifact, make_mesh(data=1, model=8, devices=jax.devices()[:8])
    )
    assert tp8 * 4 <= rep, (tp8, rep)  # >=4x cut even with int32 biases


@pytest.mark.slow
def test_tp_sharded_swin_engine_bit_identical():
    from ivit_tpu.deploy.swin_engine import build_swin_infer as _bsi
    from ivit_tpu.parallel import shard_infer_tp

    model = SwinTransformer(
        img_size=16, patch_size=2, num_classes=8, embed_dim=16,
        depths=(2, 2), num_heads=(2, 4), window_size=4,
        drop_path_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x[:2], train=True)
    artifact = freeze_swin(model, jax.tree.map(np.asarray, variables))

    single = np.asarray(jax.jit(build_swin_infer(artifact, use_pallas=False))(x))

    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    logits = np.asarray(
        shard_infer_tp(artifact, mesh, build_fn=_bsi, use_pallas=False)(x)
    )
    np.testing.assert_array_equal(single, logits)
