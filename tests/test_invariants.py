"""Global scale-propagation invariants (SURVEY.md §4c).

Every module in a full forward must emit a QTensor whose carrier is
integer-valued and within its declared bitwidth — the framework's core
contract, checked across ALL intermediates via capture_intermediates.
"""

import jax
import numpy as np
import pytest

from ivit_tpu.core.qtensor import QTensor, int_range
from ivit_tpu.models import SwinTransformer, VisionTransformer


def check_all_intermediates(model, x, rng):
    variables = model.init(rng, x, train=True)
    _, inter = model.apply(variables, x, capture_intermediates=True)

    flat = jax.tree_util.tree_flatten_with_path(
        inter["intermediates"],
        is_leaf=lambda v: isinstance(v, QTensor),
    )[0]
    checked = 0
    for path, leaf in flat:
        if not isinstance(leaf, QTensor):
            continue
        name = jax.tree_util.keystr(path)
        q = np.asarray(leaf.q)
        np.testing.assert_allclose(
            q, np.round(q), atol=1e-2,
            err_msg=f"non-integral carrier at {name}",
        )
        lo, hi = int_range(leaf.bits)
        assert q.min() >= lo - 0.01 and q.max() <= hi + 0.01, (
            f"bitwidth violation at {name}: [{q.min()}, {q.max()}] "
            f"outside {leaf.bits}-bit"
        )
        checked += 1
    assert checked > 10, f"only {checked} QTensor intermediates captured"
    return checked


class TestScalePropagation:
    @pytest.mark.slow
    def test_vit_all_modules_integral_in_range(self):
        model = VisionTransformer(
            img_size=16, patch_size=8, num_classes=8,
            embed_dim=32, depth=2, num_heads=4,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3)) * 2
        n = check_all_intermediates(model, x, jax.random.PRNGKey(1))
        assert n >= 30  # 2 blocks × ~12 quant points + embed/head

    @pytest.mark.slow
    def test_swin_all_modules_integral_in_range(self):
        model = SwinTransformer(
            img_size=16, patch_size=2, num_classes=8, embed_dim=16,
            depths=(2, 1), num_heads=(2, 4), window_size=4,
            drop_path_rate=0.0,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3)) * 2
        check_all_intermediates(model, x, jax.random.PRNGKey(1))
