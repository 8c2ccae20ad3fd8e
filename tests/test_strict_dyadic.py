"""Strict integer-ISA requant mode of the deploy engine.

``strict_dyadic=True`` swaps every requant epilogue for the 16-bit-limb
dyadic multiply+shift (round-half-away) — the reference's TVM
qnn.requantize semantics. Predictions must agree with the f32-epilogue
engine (values may differ by ±1 LSB at ties).
"""

import jax
import numpy as np

from ivit_tpu.deploy import build_vit_infer, freeze_vit
from tests.test_deploy import trained_tiny


class TestStrictDyadic:
    def test_strict_engine_close_to_default(self):
        model, variables = trained_tiny()
        x = jax.random.normal(jax.random.PRNGKey(5), (4, 16, 16, 3))
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))

        default = np.asarray(
            build_vit_infer(artifact, use_pallas=False)(x)
        )
        strict = np.asarray(
            build_vit_infer(artifact, use_pallas=False, strict_dyadic=True)(x)
        )
        head_scale = float(np.max(artifact["head"]["out_scale"]))
        np.testing.assert_allclose(strict, default, atol=8 * head_scale)
        np.testing.assert_array_equal(
            np.argmax(strict, -1), np.argmax(default, -1)
        )
