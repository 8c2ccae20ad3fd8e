"""INT8-over-FP32 speedup at the reference's own protocol (batch 1).

The paper's headline 3.72x (DeiT-S) is measured by the TVM harness,
which hard-asserts batch_size == 1 (/root/reference/TVM_benchmark/
build_model.py:59-60) on the 2080Ti. This script measures the same
ratio on one v5e chip: loop-timed int8 engine (XLA and fused-attention
variants) vs the true-FP32 (HIGHEST) forward from bench.py.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from bench import _float_vit_infer, time_fn
from ivit_tpu.deploy import build_vit_infer, freeze_vit
from ivit_tpu.models import create_model

ITERS = 200


def main():
    model = create_model("deit_small")
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (2, 224, 224, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        jax.random.PRNGKey(1), sample
    )
    artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
    x1 = jax.random.normal(rng, (1, 224, 224, 3))

    t_fp32 = time_fn(jax.jit(_float_vit_infer(artifact)), x1, iters=ITERS)
    t_xla = time_fn(jax.jit(build_vit_infer(artifact)), x1, iters=ITERS)
    t_pallas = time_fn(
        jax.jit(build_vit_infer(artifact, pallas_ops=("attention",))),
        x1, iters=ITERS,
    )
    best = min(t_xla, t_pallas)
    print(f"fp32   batch1: {t_fp32*1e3:7.3f} ms")
    print(f"int8   batch1: {t_xla*1e3:7.3f} ms (xla)  "
          f"{t_pallas*1e3:7.3f} ms (fused-attention)")
    print(f"speedup int8 over fp32 = {t_fp32/best:.2f}x "
          f"(reference claims 3.72x on 2080Ti)")


if __name__ == "__main__":
    main()
