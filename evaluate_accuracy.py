#!/usr/bin/env python
"""Evaluate the integer-only engine's accuracy.

Analogue of /root/reference/TVM_benchmark/evaluate_accuracy.py — but a
full validation sweep instead of a single cat image.

    python evaluate_accuracy.py --model deit_small \
        --artifact results/artifact.pkl --data /path/to/imagenet
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser("I-ViT int8 accuracy harness")
    p.add_argument("--model", default="deit_small")
    p.add_argument("--artifact", required=True)
    p.add_argument("--data", default="/dataset/imagenet/")
    p.add_argument("--data-set", default="IMNET",
                   choices=["IMNET", "CIFAR100", "SYNTHETIC"])
    p.add_argument("--batch-size", default=128, type=int)
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--nb-classes", default=1000, type=int)
    p.add_argument("--num-workers", default=8, type=int)
    p.add_argument("--mesh-data", default=1, type=int,
                   help="data-parallel inference over N chips "
                        "(batch sharded on a (data,) mesh)")
    p.add_argument("--mesh-model", default=1, type=int,
                   help="tensor-parallel inference over N chips "
                        "(Megatron-sharded engine weights; composes "
                        "with --mesh-data on a (data, model) mesh; "
                        "bit-identical to single-device)")
    p.add_argument("--max-batches", default=0, type=int,
                   help="0 = full validation set")
    p.add_argument("--dump-logits", default="",
                   help="save per-image engine logits + labels to this "
                        ".npz (aligns image-for-image with quant_train "
                        "--eval --dump-logits: val order is sequential)")
    p.add_argument("--weight-args", action="store_true",
                   help="weight-as-arguments engine: artifact buffers "
                        "become jit arguments instead of program "
                        "constants (needed for vit_large-scale "
                        "programs; bit-identical)")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from ivit_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from ivit_tpu.data import DataLoader, build_dataset, eval_transform
    from ivit_tpu.data.loader import ShuffleSampler
    from ivit_tpu.deploy import build_vit_infer
    from ivit_tpu.deploy.swin_engine import build_swin_infer
    from ivit_tpu.utils import load_artifact

    artifact = load_artifact(args.artifact)
    build_infer = (
        build_swin_infer if args.model.startswith("swin") else build_vit_infer
    )
    if args.mesh_model > 1:
        from ivit_tpu.parallel import make_mesh, shard_infer_tp

        n = args.mesh_data * args.mesh_model
        mesh = make_mesh(data=args.mesh_data, model=args.mesh_model,
                         devices=jax.devices()[:n])
        infer = shard_infer_tp(artifact, mesh, build_fn=build_infer)
    elif args.mesh_data > 1:
        from ivit_tpu.parallel import make_mesh, shard_infer

        mesh = make_mesh(data=args.mesh_data, model=1,
                         devices=jax.devices()[: args.mesh_data])
        infer = shard_infer(build_infer(artifact), mesh)
    elif args.weight_args:
        from ivit_tpu.deploy.weight_args import build_infer_weight_args

        infer = build_infer_weight_args(artifact, build_infer)
    else:
        infer = jax.jit(build_infer(artifact))

    ds = build_dataset(args.data_set, args.data, False,
                       args.input_size, args.nb_classes)
    loader = DataLoader(
        ds, args.batch_size,
        lambda img, rng: eval_transform(img, size=args.input_size),
        sampler=ShuffleSampler(len(ds), shuffle=False),
        drop_last=False, num_workers=args.num_workers,
    )

    top1 = top5 = seen = 0
    dumped_logits, dumped_labels = [], []
    for b, (images, labels) in enumerate(loader):
        if args.max_batches and b >= args.max_batches:
            break
        n = len(labels)
        pad = -n % args.mesh_data
        if pad:  # ragged last batch: pad to the data-axis multiple
            # modular indexing, not images[:pad] — pad can exceed n
            # (e.g. a 16-image final batch on a 64-wide data mesh)
            images = np.concatenate([images, images[np.arange(pad) % n]])
        logits = np.asarray(infer(images))[:n]
        if args.dump_logits:
            dumped_logits.append(logits)
            dumped_labels.append(np.asarray(labels))
        order = np.argsort(logits, -1)
        top1 += int((order[:, -1] == labels).sum())
        top5 += int((order[:, -5:] == labels[:, None]).any(-1).sum())
        seen += len(labels)
        if b % 20 == 0:
            print(f"[{seen}] top1 {100*top1/seen:.3f} top5 {100*top5/seen:.3f}")
    print(f"FINAL top1 {100*top1/seen:.3f} top5 {100*top5/seen:.3f} over {seen}")
    if args.dump_logits:
        np.savez(args.dump_logits,
                 logits=np.concatenate(dumped_logits),
                 labels=np.concatenate(dumped_labels))
        print(f"dumped {seen} engine logits to {args.dump_logits}")


if __name__ == "__main__":
    main()
