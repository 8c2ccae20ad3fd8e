"""INT8 vs FP32 ratio across batch sizes (DeiT-S, one chip).

The paper's headline 3.72x is measured at the reference's deployment
operating point — batch 1 on its GPU (TVM harness hard-asserts batch
1). This sweep shows where the TPU engine's like-for-like ratio lands
per batch size.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from bench import _float_vit_infer
from ivit_tpu.deploy import build_vit_infer, freeze_vit
from ivit_tpu.models import create_model


def time_fn(fn, x, iters):
    float(fn(x)[0, 0])
    float(fn(x)[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    float(out[0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    # shipping perf config (see bench.py)
    model = create_model("deit_small", softmax_bits=8, gelu_stable=True)
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (2, 224, 224, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        jax.random.PRNGKey(1), sample
    )
    artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))

    batches = [int(b) for b in sys.argv[1:]] or [1, 8, 64, 96, 128, 160, 256]
    for batch in batches:
        iters = 100 if batch <= 8 else 30
        images = jax.random.normal(rng, (batch, 224, 224, 3))
        t_fp32 = time_fn(jax.jit(_float_vit_infer(artifact)), images, iters)
        t_int8 = time_fn(jax.jit(build_vit_infer(artifact)), images, iters)
        # bit-identical packed-boundary variant (bench.py auto-selects
        # between the two; the ratio sweep shows both)
        t_pack = time_fn(
            jax.jit(build_vit_infer(artifact, sm_packed=True)), images, iters
        )
        row = (f"batch {batch:4d}: fp32 {t_fp32*1e3:7.2f} ms  "
               f"int8 {t_int8*1e3:7.2f} ms  smpack {t_pack*1e3:7.2f} ms  "
               f"ratio {t_fp32/min(t_int8, t_pack):.2f}x")
        if batch <= 8:
            fn = jax.jit(build_vit_infer(
                artifact, use_pallas=True, pallas_ops=("attention",)))
            t_pa = time_fn(fn, images, iters)
            row += f"  int8-fused-attn {t_pa*1e3:6.2f} ms ratio {t_fp32/t_pa:.2f}x"
        print(row)


if __name__ == "__main__":
    main()
