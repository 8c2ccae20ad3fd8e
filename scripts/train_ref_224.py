#!/usr/bin/env python
"""Train the REFERENCE torch model at 224² to get TRAINED weight
distributions for the full-scale differential (VERDICT r4 #2).

The round-4 224² differential ran on reference-init (trunc_normal)
weights; trained networks have outlier channels, skewed activation
ranges, and γ/β far from init — exactly what stresses EMA dynamics,
carrier saturation, and the ShiftGELU division cliff. Real pretrained
checkpoints are unfetchable here (zero egress), so this trains the
reference's own executable QAT model (/root/reference/models/
{vit,swin}_quant.py, torch CPU) on deterministic synthetic photographs
(the class-coded SyntheticDataset through the real eval transform — the
same input distribution the differential calibrates with) and saves
``{'model': state_dict}``, which ``full_scale_differential.py
--checkpoint`` then loads into BOTH stacks.

The goal is realistic trained structure, not generalization: a few
hundred AdamW steps at lr 5e-4 move every γ/β/weight well off init and
give the activation ranges real skew.

Usage (CPU, slow — deit ~15 min/epoch at n=512):
    python scripts/train_ref_224.py --family deit --epochs 3 \
        --out /tmp/ref224_deit.pth.tar
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
_REF_ROOT = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["deit", "swin"], default="deit")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--classes", type=int, default=100,
                    help="distinct labels used (head stays 1000-wide to "
                         "match the differential's factory build)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    torch.manual_seed(0)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if _REF_ROOT not in sys.path:
        sys.path.insert(0, _REF_ROOT)
    import models as ref_models

    from ivit_tpu.data import eval_transform
    from ivit_tpu.data.datasets import SyntheticDataset

    if args.family == "deit":
        model = ref_models.vit_quant.deit_tiny_patch16_224()
    else:
        model = ref_models.swin_quant.swin_tiny_patch4_window7_224(
            drop_path_rate=0.0
        )
    model.train()
    ref_models.model_utils.unfreeze_model(model)

    ds = SyntheticDataset(
        n=args.n, size=256, num_classes=args.classes, seed=7
    )
    imgs = np.stack(
        [eval_transform(ds.load(i)[0], size=224) for i in range(args.n)]
    ).astype(np.float32)
    labels = np.asarray([ds.load(i)[1] for i in range(args.n)], np.int64)
    x_all = torch.from_numpy(
        np.ascontiguousarray(imgs.transpose(0, 3, 1, 2))
    )
    y_all = torch.from_numpy(labels)

    opt = torch.optim.AdamW(model.parameters(), lr=args.lr,
                            weight_decay=1e-4)
    crit = torch.nn.CrossEntropyLoss(label_smoothing=0.1)
    steps = args.n // args.batch
    for ep in range(args.epochs):
        perm = np.random.default_rng(ep).permutation(args.n)
        t0 = time.time()
        tot, hit = 0.0, 0
        for s in range(steps):
            idx = perm[s * args.batch:(s + 1) * args.batch]
            x, y = x_all[idx], y_all[idx]
            out = model(x)
            loss = crit(out, y)
            opt.zero_grad()
            loss.backward()
            opt.step()
            tot += float(loss.detach())
            hit += int((out.argmax(-1) == y).sum())
            print(f"  ep{ep} step {s + 1}/{steps} loss {float(loss):.3f}",
                  flush=True)
        print(
            f"epoch {ep}  loss {tot / steps:.4f}  "
            f"train acc {100 * hit / (steps * args.batch):.1f}  "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )

    # freeze with the reference's own code, one eval forward to settle
    # the integer buffers under frozen scales, then save in
    # checkpoint.pth.tar form
    ref_models.model_utils.freeze_model(model)
    model.eval()
    with torch.no_grad():
        model(x_all[: args.batch])
    torch.save({"model": model.state_dict()}, args.out)
    print(f"saved trained reference checkpoint → {args.out}")


if __name__ == "__main__":
    main()
