#!/usr/bin/env python
"""Convert a QAT checkpoint into a deployable integer artifact.

Analogue of /root/reference/TVM_benchmark/convert_model.py: reads the
trained state (params + frozen EMA ranges) and writes the int8/int32
artifact the inference engine consumes.

    python convert_model.py --model deit_small \
        --checkpoint results/checkpoint.pkl --output results/artifact.pkl
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser("I-ViT artifact converter")
    p.add_argument("--model", default="deit_small")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", default="results/artifact.pkl")
    p.add_argument("--nb-classes", default=1000, type=int)
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--window-size", default=7, type=int,
                   help="Swin window size (must match training)")
    p.add_argument("--export-engine", default="",
                   help="also export a compiled StableHLO engine "
                        "(self-contained; loads with jax alone)")
    p.add_argument("--export-batch", default=1, type=int,
                   help="batch size the exported engine is built for")
    p.add_argument("--softmax-bits", default=16, type=int, choices=(8, 16),
                   help="ViT probability precision (must match training; "
                        "recorded in the artifact and honored by the "
                        "engine)")
    p.add_argument("--gelu-stable", action="store_true",
                   help="elementwise-stable ShiftGELU (must match "
                        "training; recorded in the artifact)")
    args = p.parse_args(argv)

    from ivit_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from ivit_tpu.deploy import freeze_vit
    from ivit_tpu.deploy.swin_engine import freeze_swin
    from ivit_tpu.models import create_model
    from ivit_tpu.utils import load_checkpoint_raw, save_artifact

    kwargs = dict(num_classes=args.nb_classes, img_size=args.input_size)
    if args.model.startswith("swin"):
        kwargs["window_size"] = args.window_size
    elif args.softmax_bits != 16:
        kwargs["softmax_bits"] = args.softmax_bits
    if args.gelu_stable:
        kwargs["gelu_stable"] = True
    model = create_model(args.model, **kwargs)
    # Only params + quant_stats are needed to freeze; the raw state-dict
    # avoids reconstructing the training-time optimizer pytree.
    raw, extra = load_checkpoint_raw(args.checkpoint)
    variables = {"params": raw["params"], "quant_stats": raw["quant_stats"]}
    freeze = freeze_swin if args.model.startswith("swin") else freeze_vit
    artifact = freeze(model, variables)
    save_artifact(args.output, artifact)
    print(f"wrote {args.output} (epoch {extra.get('epoch', '?')}, "
          f"best_acc1 {extra.get('best_acc1', '?')})")

    if args.export_engine:
        from ivit_tpu.deploy import export_engine
        from ivit_tpu.deploy.engine import build_vit_infer
        from ivit_tpu.deploy.swin_engine import build_swin_infer

        build = (
            build_swin_infer if args.model.startswith("swin")
            else build_vit_infer
        )
        export_engine(
            build(artifact), args.export_batch, args.input_size,
            path=args.export_engine,
        )
        print(f"wrote {args.export_engine} "
              f"(StableHLO, batch {args.export_batch})")


if __name__ == "__main__":
    main()
