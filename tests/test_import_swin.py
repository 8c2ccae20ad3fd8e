"""Swin torch-checkpoint importer test."""

import jax
import numpy as np

from ivit_tpu.models import SwinTransformer
from ivit_tpu.models.import_swin import torch_swin_to_params
from ivit_tpu.models.import_torch import merge_params


def fake_swin_sd(D=16, depths=(1, 1), heads=(2, 4), p=2, ws=4):
    rng = np.random.default_rng(0)

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32)

    sd = {
        "patch_embed.proj.weight": t(D, 3, p, p),
        "patch_embed.proj.bias": t(D),
        "patch_embed.norm.weight": t(D),
        "patch_embed.norm.bias": t(D),
    }
    for i, depth in enumerate(depths):
        dim = D * 2**i
        for j in range(depth):
            pre = f"layers.{i}.blocks.{j}"
            sd.update({
                f"{pre}.norm1.weight": t(dim),
                f"{pre}.norm1.bias": t(dim),
                f"{pre}.norm2.weight": t(dim),
                f"{pre}.norm2.bias": t(dim),
                f"{pre}.attn.relative_position_bias_table": t(
                    (2 * ws - 1) ** 2, heads[i]
                ),
                f"{pre}.attn.qkv.weight": t(3 * dim, dim),
                f"{pre}.attn.qkv.bias": t(3 * dim),
                f"{pre}.attn.proj.weight": t(dim, dim),
                f"{pre}.attn.proj.bias": t(dim),
                f"{pre}.mlp.fc1.weight": t(4 * dim, dim),
                f"{pre}.mlp.fc1.bias": t(4 * dim),
                f"{pre}.mlp.fc2.weight": t(dim, 4 * dim),
                f"{pre}.mlp.fc2.bias": t(dim),
            })
        if i < len(depths) - 1:
            sd.update({
                f"layers.{i}.downsample.norm.weight": t(4 * dim),
                f"layers.{i}.downsample.norm.bias": t(4 * dim),
                f"layers.{i}.downsample.reduction.weight": t(2 * dim, 4 * dim),
            })
    nf = D * 2 ** (len(depths) - 1)
    sd.update({
        "norm.weight": t(nf),
        "norm.bias": t(nf),
        "head.weight": t(8, nf),
        "head.bias": t(8),
    })
    return sd


def test_swin_import_and_apply():
    model = SwinTransformer(
        img_size=16, patch_size=2, num_classes=8, embed_dim=16,
        depths=(1, 1), num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x, train=True)

    sd = fake_swin_sd()
    loaded = torch_swin_to_params(sd)
    params = merge_params(variables["params"], loaded)

    np.testing.assert_array_equal(
        np.asarray(params["layers_0_blocks_0"]["attn"]["qkv"]["kernel"]),
        sd["layers.0.blocks.0.attn.qkv.weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(params["layers_0_downsample"]["reduction"]["kernel"]),
        sd["layers.0.downsample.reduction.weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(params["patch_norm"]["scale"]),
        sd["patch_embed.norm.weight"],
    )

    logits = model.apply(
        {"params": params, "quant_stats": variables["quant_stats"]}, x
    )
    assert logits.shape == (2, 8)
    assert np.isfinite(np.asarray(logits)).all()
