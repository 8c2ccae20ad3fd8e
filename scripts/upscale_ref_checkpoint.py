#!/usr/bin/env python
"""Upscale a CONVERGED 32² reference checkpoint to 224² geometry.

VERDICT r4 #2 names two local sources of trained weight distributions
for the 224² differential; this implements the stronger one:
"upsampled-resolution finetuning of the converged 32² models". The
migration run's converged checkpoints (100% top-1 deit / 95%+ swin,
scripts/migrate_ref_checkpoint.py) carry fully-trained trunks — every
block weight, γ/β, and attention structure is shape-identical between
the 32² and 224² builds of the same factory; only the geometry-bound
leaves differ:

  * ViT ``pos_embed`` (1, 5, D) → (1, 197, D): cls row kept, the 2×2
    grid bicubic-resized to 14×14 — the reference's own pos-embed
    resize semantics (/root/reference/models/utils.py:148-161,
    F.interpolate bicubic on the grid).
  * ViT ``head`` (100, D) → embedded into the 224² build's 1000-row
    init head at rows 0..99 (the trained class columns keep their
    margins; the remaining rows stay at reference init).
  * Swin rel-pos tables / attn_mask (window 4 at 32² vs 7 at 224²):
    shape-mismatched, dropped — ``full_scale_differential`` loads with
    strict=False and both stacks keep their (identical) init tables.

Quant buffers (min/max/scales/integers) are dropped: the differential
re-calibrates both stacks from scratch — that is the thing under test.

Usage:
    python scripts/upscale_ref_checkpoint.py --family deit \
        --src /tmp/migrate_ref/deit/checkpoint.pth.tar \
        --out /tmp/ref224_deit_up.pth.tar
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["deit", "swin"], default="deit")
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    obj = torch.load(args.src, map_location="cpu")
    sd = obj.get("model", obj)
    out = {}
    for k, v in sd.items():
        if any(t in k for t in ("min_val", "max_val", "scaling_factor",
                                "_integer", "attn_mask",
                                "relative_position")):
            continue
        out[k] = v

    if args.family == "deit":
        pe = out["pos_embed"]  # (1, 5, D)
        assert pe.shape[1] == 5, pe.shape
        D = pe.shape[-1]
        cls_pos, grid = pe[:, :1], pe[:, 1:]
        grid = grid.reshape(1, 2, 2, D).permute(0, 3, 1, 2)
        grid = torch.nn.functional.interpolate(
            grid, size=(14, 14), mode="bicubic", align_corners=False
        )
        grid = grid.permute(0, 2, 3, 1).reshape(1, 196, D)
        out["pos_embed"] = torch.cat([cls_pos, grid], dim=1)
        # 100-class trained head → rows 0..99 of a 1000-row init head
        # (deterministic trunc-normal-like init at the trained std)
        hw, hb = out["head.weight"], out["head.bias"]
        g = torch.Generator().manual_seed(0)
        big_w = torch.randn((1000, D), generator=g) * float(hw.std())
        big_b = torch.zeros((1000,))
        big_w[:100], big_b[:100] = hw, hb
        out["head.weight"], out["head.bias"] = big_w, big_b
    else:
        hw = out["head.weight"]
        D = hw.shape[1]
        g = torch.Generator().manual_seed(0)
        big_w = torch.randn((1000, D), generator=g) * float(hw.std())
        big_b = torch.zeros((1000,))
        big_w[:100], big_b[:100] = hw, out["head.bias"]
        out["head.weight"], out["head.bias"] = big_w, big_b

    torch.save({"model": out}, args.out)
    kept = len(out)
    print(f"wrote {args.out}: {kept} trained tensors "
          f"({'pos_embed bicubic 5->197, ' if args.family == 'deit' else ''}"
          f"head embedded 100->1000)")


if __name__ == "__main__":
    main()
