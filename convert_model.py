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
    p.add_argument("--model", default=None,
                   help="model name; defaults to the one recorded in "
                        "the checkpoint (deit_small for checkpoints "
                        "predating the metadata)")
    p.add_argument("--checkpoint", default=None,
                   help="our QAT checkpoint (quant_train.py output)")
    p.add_argument("--torch-checkpoint", default=None,
                   help="the REFERENCE's trained checkpoint.pth.tar "
                        "(ViT/DeiT or Swin family): its weight_integer/"
                        "bias_integer/*_scaling_factor buffers are "
                        "ingested verbatim — the load_qconfig analogue "
                        "(TVM_benchmark/convert_model.py:12-148). "
                        "Requires --model for the head count(s). Swin "
                        "ingestion is capability BEYOND the reference: "
                        "its own converter handles blocks.%%d ViT names "
                        "only, so its trained Swin models could never "
                        "be deployed; here they serve on the int8 Swin "
                        "engine (pass --input-size if not 224)")
    p.add_argument("--output", default="results/artifact.pkl")
    p.add_argument("--nb-classes", default=None, type=int,
                   help="defaults to the checkpoint's recorded value "
                        "(1000 for checkpoints predating the metadata)")
    p.add_argument("--input-size", default=None, type=int,
                   help="defaults to the checkpoint's recorded value "
                        "(224 for checkpoints predating the metadata)")
    p.add_argument("--window-size", default=None, type=int,
                   help="Swin window size (must match training); "
                        "defaults to the checkpoint's recorded value "
                        "(7 for checkpoints predating the metadata)")
    p.add_argument("--export-engine", default="",
                   help="also export a compiled StableHLO engine "
                        "(self-contained; loads with jax alone)")
    p.add_argument("--export-batch", default=1, type=int,
                   help="batch size the exported engine is built for")
    p.add_argument("--softmax-bits", default=None, type=int, choices=(8, 16),
                   help="ViT probability precision (must match training; "
                        "recorded in the artifact and honored by the "
                        "engine). Defaults to the value recorded in the "
                        "checkpoint (16 for checkpoints predating the "
                        "metadata)")
    p.add_argument("--gelu-stable", default=None, action="store_true",
                   help="elementwise-stable ShiftGELU (must match "
                        "training; recorded in the artifact). Defaults "
                        "to the value recorded in the checkpoint")
    args = p.parse_args(argv)

    if (args.checkpoint is None) == (args.torch_checkpoint is None):
        raise SystemExit(
            "pass exactly one of --checkpoint (our QAT state) or "
            "--torch-checkpoint (the reference's checkpoint.pth.tar)"
        )

    from ivit_tpu.utils import enable_compile_cache

    enable_compile_cache()

    if args.torch_checkpoint:
        return _ingest_torch(args)

    from ivit_tpu.deploy import freeze_vit
    from ivit_tpu.deploy.swin_engine import freeze_swin
    from ivit_tpu.models import create_model
    from ivit_tpu.utils import load_checkpoint_raw, save_artifact

    # Only params + quant_stats are needed to freeze; the raw state-dict
    # avoids reconstructing the training-time optimizer pytree.
    raw, extra = load_checkpoint_raw(args.checkpoint)

    def _resolve(flag_name, cli_value, recorded, default):
        """softmax_bits/gelu_stable are spec-level model properties the
        scales were trained under; quant_train records them in the
        checkpoint, and a silent mismatch at freeze time would degrade
        accuracy with no error. CLI value wins only when it agrees (or
        nothing was recorded — pre-metadata checkpoints)."""
        if recorded is not None and cli_value is not None \
                and cli_value != recorded:
            raise SystemExit(
                f"--{flag_name}={cli_value} conflicts with the "
                f"checkpoint, which was trained with "
                f"{flag_name}={recorded} (recorded by quant_train). "
                f"Drop the flag to use the recorded value."
            )
        if cli_value is not None:
            return cli_value
        return recorded if recorded is not None else default

    if (args.model is not None and extra.get("model") is not None
            and extra["model"] != args.model):
        raise SystemExit(
            f"--model={args.model} but the checkpoint was trained as "
            f"{extra['model']!r}"
        )
    model_name = args.model or extra.get("model") or "deit_small"
    args.model = model_name  # downstream code branches on the name

    recorded_sm = extra.get("softmax_bits")
    if recorded_sm == 16 and model_name.startswith("swin"):
        # legacy false record, mirrored from quant_train.check_resume_spec:
        # swin checkpoints written before the metadata fix recorded the
        # (ignored) ViT flag default 16, not the model's true 8-bit spec
        # (models/swin.py hardcodes IntSoftmax(out_bits=8))
        recorded_sm = 8
    sm_bits = _resolve("softmax-bits", args.softmax_bits,
                       recorded_sm, 16)
    gelu_stable = _resolve("gelu-stable", args.gelu_stable,
                           extra.get("gelu_stable"), False)
    # Geometry is equally spec-level: scales/pos-embed were trained at
    # one (input_size, nb_classes, window_size) and freezing at another
    # is at best a loud shape error, at worst silent degradation.
    args.nb_classes = _resolve("nb-classes", args.nb_classes,
                               extra.get("nb_classes"), 1000)
    args.input_size = _resolve("input-size", args.input_size,
                               extra.get("input_size"), 224)
    args.window_size = _resolve("window-size", args.window_size,
                                extra.get("window_size"), 7)

    kwargs = dict(num_classes=args.nb_classes, img_size=args.input_size)
    if model_name.startswith("swin"):
        kwargs["window_size"] = args.window_size
    elif sm_bits != 16:
        kwargs["softmax_bits"] = sm_bits
    if gelu_stable:
        kwargs["gelu_stable"] = True
    model = create_model(model_name, **kwargs)
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


def _ingest_torch(args):
    """--torch-checkpoint: deploy the reference's own trained state."""
    try:
        import torch
    except ImportError:
        raise SystemExit(
            "--torch-checkpoint needs torch (for deserialization only)"
        )

    from ivit_tpu.deploy.ingest_torch import (
        torch_swin_state_to_artifact,
        torch_vit_state_to_artifact,
        unwrap_state_dict,
    )
    from ivit_tpu.models import create_model
    from ivit_tpu.utils import save_artifact

    if args.model is None:
        raise SystemExit(
            "--torch-checkpoint requires a --model name (the head "
            "count is not recoverable from the buffers; the reference "
            "converter likewise takes --depth from the operator, "
            "TVM_benchmark/convert_model.py:160)"
        )
    is_swin = args.model.startswith("swin")
    num_heads = create_model(args.model).num_heads
    sd = unwrap_state_dict(
        torch.load(args.torch_checkpoint, map_location="cpu")
    )
    if is_swin:
        artifact = torch_swin_state_to_artifact(
            sd,
            num_heads=num_heads,
            img_size=args.input_size or 224,
            gelu_stable=bool(args.gelu_stable),
        )
    else:
        artifact = torch_vit_state_to_artifact(
            sd,
            num_heads=num_heads,
            softmax_bits=args.softmax_bits or 16,
            gelu_stable=bool(args.gelu_stable),
        )
    save_artifact(args.output, artifact)
    c = artifact["config"]
    depth = c.get("depth") or "-".join(str(d) for d in c["depths"])
    print(f"wrote {args.output} (ingested reference checkpoint: "
          f"depth {depth}, dim {c['embed_dim']}, "
          f"img {c['img_size']}, classes {c['num_classes']})")

    if args.export_engine:
        from ivit_tpu.deploy import export_engine
        from ivit_tpu.deploy.engine import build_vit_infer
        from ivit_tpu.deploy.swin_engine import build_swin_infer

        build = build_swin_infer if is_swin else build_vit_infer
        export_engine(
            build(artifact), args.export_batch,
            c["img_size"], path=args.export_engine,
        )
        print(f"wrote {args.export_engine} "
              f"(StableHLO, batch {args.export_batch})")


if __name__ == "__main__":
    main()
