#!/usr/bin/env python
"""Integer-only inference latency harness.

Analogue of /root/reference/TVM_benchmark/evaluate_latency.py — XLA AOT
compilation replaces the 50k-trial TVM auto-scheduler search; timing
follows the same repeat/warm protocol (module.benchmark semantics).

    python evaluate_latency.py --model deit_small --batch-size 1
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser("I-ViT int8 latency harness")
    p.add_argument("--model", default="deit_small")
    p.add_argument("--artifact", default="",
                   help="optional artifact; random weights if omitted "
                        "(the reference harness also times random params)")
    p.add_argument("--batch-size", default=1, type=int)
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--nb-classes", default=1000, type=int)
    p.add_argument("--repeat", default=100, type=int)
    p.add_argument("--softmax-bits", default=16, type=int, choices=(8, 16),
                   help="ViT probability precision for the random-init "
                        "path (8 = the reference TVM deploy precision: "
                        "int8 probs + pure int8 attn@V)")
    p.add_argument("--gelu-stable", action="store_true",
                   help="elementwise-stable ShiftGELU for the "
                        "random-init path")
    p.add_argument("--pallas-attention", default=None,
                   action=argparse.BooleanOptionalAction,
                   help="fully-fused int8 attention kernel. Default "
                        "auto-selects by regime: ON at batch size <= 8 "
                        "(wins the latency regime, 0.51 vs 0.68 ms "
                        "DeiT-S batch 1) and OFF at larger batches "
                        "(XLA's batched matmuls win at batch 128); "
                        "--no-pallas-attention forces it off")
    p.add_argument("--weight-args", action="store_true",
                   help="weight-as-arguments engine: artifact buffers "
                        "become jit arguments instead of program "
                        "constants (needed for vit_large-scale "
                        "programs; bit-identical)")
    p.add_argument("--sm-packed", action="store_true",
                   help="hand the softmax pass-boundary exp across HBM "
                        "as a packed u16 instead of f32 (value-"
                        "identical; ops/shiftmax packed_exp)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ivit_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    from ivit_tpu.deploy import build_vit_infer, freeze_vit
    from ivit_tpu.deploy.swin_engine import build_swin_infer, freeze_swin
    from ivit_tpu.models import create_model
    from ivit_tpu.utils import load_artifact

    is_swin = args.model.startswith("swin")
    freeze = freeze_swin if is_swin else freeze_vit
    build_infer = build_swin_infer if is_swin else build_vit_infer

    if args.artifact:
        artifact = load_artifact(args.artifact)
    else:
        mk = dict(num_classes=args.nb_classes, img_size=args.input_size)
        if not is_swin and args.softmax_bits != 16:
            mk["softmax_bits"] = args.softmax_bits
        if args.gelu_stable:
            mk["gelu_stable"] = True
        model = create_model(args.model, **mk)
        sample = jnp.zeros((1, args.input_size, args.input_size, 3))
        variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
            jax.random.PRNGKey(0), sample
        )
        artifact = freeze(model, jax.tree.map(np.asarray, variables))

    images = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(args.batch_size, args.input_size, args.input_size, 3)
        ),
        jnp.float32,
    )
    use_fused_attn = args.pallas_attention
    if use_fused_attn is None:
        # measured crossover on v5e: the fused kernel wins ViT
        # small-batch latency (DeiT-S batch 1: 0.51 vs 0.68 ms), XLA's
        # batched matmuls win large-batch throughput. For Swin the
        # per-(window·head) kernel LOSES even at batch 1 (Swin-T:
        # 1.23 ms fused vs 0.85-1.05 XLA — 64 windows × heads of
        # N=49 tiles launch too small to beat XLA's batching), so the
        # auto-select never engages it; --pallas-attention forces it.
        use_fused_attn = args.batch_size <= 8 and not is_swin
    kwargs = {}
    if use_fused_attn and jax.default_backend() != "cpu":
        # both families have a fused attention kernel: per (batch·head)
        # for ViT, per (window·head) for Swin (kernels/)
        kwargs = dict(use_pallas=True, pallas_ops=("attention",))
        print("engine: fused int8 attention (batch-1 latency regime)")
    if args.sm_packed:
        if kwargs.get("pallas_ops"):
            print(
                "note: --sm-packed has no effect while the fused "
                "attention kernel is engaged (softmax runs inside the "
                "kernel); pass --no-pallas-attention to measure the "
                "packed XLA softmax boundary"
            )
        kwargs["sm_packed"] = True
    # AOT compile (the relay.build analogue).
    t0 = time.perf_counter()
    if args.weight_args:
        # weight-as-arguments engine: required for vit_large-scale
        # programs (closure constants exceed the remote-compile upload
        # limit); bit-identical (tests/test_weight_args.py)
        from ivit_tpu.deploy.weight_args import build_infer_weight_args

        compiled = build_infer_weight_args(artifact, build_infer, **kwargs)
    else:
        compiled = (
            jax.jit(build_infer(artifact, **kwargs)).lower(images).compile()
        )
    print(f"compile: {time.perf_counter() - t0:.1f}s")

    # final host readback forces true completion (block_until_ready does
    # not synchronize through the remote TPU relay)
    float(compiled(images)[0, 0])
    t0 = time.perf_counter()
    for _ in range(args.repeat):
        out = compiled(images)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / args.repeat
    print(
        f"{args.model} int8 batch={args.batch_size}: "
        f"{dt*1e3:.3f} ms/iter, {args.batch_size/dt:.1f} img/s"
    )


if __name__ == "__main__":
    main()
