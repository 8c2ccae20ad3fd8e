"""Batch-128 int8 throughput across the model zoo (one v5e chip).

Usage: python scripts/bench_zoo.py [--ship] [--smpack] [--scoresf32]
                                   [--pattn] [--hmajor] [--winpad=N]
                                   [--wmajor] [--weight-args] [model ...]
Defaults to the six flagship configs. Loop-timed with final readback.
``--smpack`` / ``--scoresf32`` select the bit-identical engine variants
(packed-u16 softmax boundary; bf16→f32 window dots, Swin only);
``--pattn`` / ``--hmajor`` / ``--winpad=N`` / ``--wmajor`` are the Swin
score-layout probes (fused Pallas window attention; head-major q/k/v
carriers; token-axis pad to N; head-split fused into the qkv GEMM) —
all bit-identical to the default engine.

``--ship`` freezes each model in the shipping perf config (the one
bench.py times): 8-bit softmax probabilities + pure int8 attn@V for the
ViT family — the reference TVM graph's own deploy precision — and the
elementwise-stable ShiftGELU for both families (Swin's softmax is
already 8-bit by spec). Without it, models run the reference's 16-bit
QAT-spec precision.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from ivit_tpu.deploy import build_vit_infer, freeze_vit
from ivit_tpu.deploy.swin_engine import build_swin_infer, freeze_swin
from ivit_tpu.models import create_model

BATCH = 128
ITERS = 20


def time_fn(fn, x, iters=ITERS):
    float(fn(x)[0, 0])
    float(fn(x)[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    float(out[0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    argv = sys.argv[1:]
    ship = "--ship" in argv
    names = [a for a in argv if not a.startswith("--")] or [
        "deit_tiny", "deit_small", "deit_base",
        "swin_tiny", "swin_small", "swin_base",
    ]
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (BATCH, 224, 224, 3))
    for name in names:
        is_swin = name.startswith("swin")
        mk = {}
        if ship:
            mk["gelu_stable"] = True
            if not is_swin:
                mk["softmax_bits"] = 8
        model = create_model(name, **mk)
        sample = jax.random.normal(rng, (2, 224, 224, 3))
        variables = jax.jit(lambda r, x, m=model: m.init(r, x, train=True))(
            jax.random.PRNGKey(1), sample
        )
        freeze = freeze_swin if is_swin else freeze_vit
        build = build_swin_infer if is_swin else build_vit_infer
        artifact = freeze(model, jax.tree.map(np.asarray, variables))
        kw = {}
        if "--smpack" in argv:
            kw["sm_packed"] = True
        if "--scoresf32" in argv and is_swin:
            kw["scores_f32"] = True
        if "--pattn" in argv and is_swin:
            # probe (c): fully-fused Pallas window attention at batch
            # 128 — scores never reach HBM (VERDICT r3 item 3c)
            kw["use_pallas"] = True
            kw["pallas_ops"] = ("attention",)
        if "--hmajor" in argv and is_swin:
            # probe (b): explicit head-major q/k/v carriers
            kw["qkv_hmajor"] = True
        if "--wmajor" in argv and is_swin:
            # round-5 spec-level probe: the qkv GEMM itself emits
            # head-major (3,H,hd,Bw,N) planes (no head-split anywhere)
            kw["qkv_wmajor"] = True
        for a in argv:
            if a.startswith("--winpad=") and is_swin:
                # probe (a): tile-aligned score planes (e.g. 56 or 64)
                kw["win_pad"] = int(a.split("=", 1)[1])
        if "--weight-args" in argv:
            # weight-as-arguments engine (deploy/weight_args.py):
            # required for vit_large-scale programs on the relay
            # (closure constants exceed the upload limit), bit-identical
            from ivit_tpu.deploy.weight_args import build_infer_weight_args

            fn = build_infer_weight_args(artifact, build, **kw)
        else:
            fn = jax.jit(build(artifact, **kw))
        t = time_fn(fn, images)
        print(f"{name:12s} {t*1e3:8.2f} ms  {BATCH/t:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
