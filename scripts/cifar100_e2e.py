#!/usr/bin/env python
"""CIFAR-100 end-to-end recipe: QAT → freeze → int8 engine (VERDICT r3 #1).

Runs the CIFAR-100-at-32² production sequence the reference itself
supports (`/root/reference/utils/data_utils.py:52-58`; its 32² branch is
the pad-4-crop recipe our data/transforms.py `size==32` path mirrors):

    1. quant_train  --data-set CIFAR100 --input-size 32   (QAT, N epochs)
    2. quant_train  --eval                                (simulator top-1)
    3. convert_model                                      (freeze → int8)
    4. evaluate_accuracy                                  (integer engine)
    5. assert engine reproduces the simulator's per-image decisions

Data resolution, in order:
  * `<data>/cifar-100-python/{train,test}` already present → REAL run.
    On a networked box, fetch first:
        curl -LO https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz
        tar xf cifar-100-python.tar.gz -C <data>
  * otherwise a FABRICATED archive is written in the exact on-disk
    format (python-pickle, b"data" uint8 (N,3072) row-major RGB planes,
    b"fine_labels"/b"coarse_labels", meta with label names) with
    position-coded learnable content, and the run is labeled FABRICATED.
    This box has zero egress (DNS resolves nothing — measured
    2026-08-19: `curl https://www.cs.toronto.edu/...` exit 6), so the
    fabricated path is what CI here can execute; the command line is
    identical for the real bytes.

Both families: deit_tiny (patch16 at 32² → 2×2 grid) and swin_tiny
(--window-size 4; stages clamp to grid exactly as the reference does).

Usage: python scripts/cifar100_e2e.py [--family deit|swin|both]
           [--epochs N] [--data DIR] [--train-n N] [--test-n N]
"""

import argparse
import json
import os
import pickle
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fab_class_color(lab):
    """Class → RGB of the coded center square: a 5×5×4 color lattice
    (R/G levels {25,75,125,175,225}, B levels {30,90,150,210}) keeps
    neighbouring classes ≥50 gray-levels apart per channel — far above
    the 0..95 background noise floor's local fluctuations."""
    return (
        25 + 50 * (lab % 5),
        25 + 50 * ((lab // 5) % 5),
        30 + 60 * (lab // 25),
    )


def fabricate(root, train_n=2000, test_n=500, seed=0, hard=0):
    """Write cifar-100-python/{train,test,meta} in the real format.

    Content is learnable (class-coded, on noise) so the trained
    accuracy and the sim==engine assertion are non-trivial.  The coding
    must survive the reference's own 32² train recipe — pad-4 random
    crop + horizontal flip (utils/data_utils.py:76-80 semantics,
    mirrored by data/transforms.py) — exactly as real CIFAR classes
    do.  An earlier position-coded design used 3-px cells; the crop's
    ±4 px jitter exceeds that pitch, so augmented train images of
    neighbouring classes became indistinguishable and QAT plateaued at
    chance (measured, round 4).  The robust coding: each class is the
    RGB COLOR of a 16² center square (5 R levels × 5 G levels × 4 B
    levels = 100 classes).  The square spans rows/cols [8, 24), so
    every ±4 px crop keeps it fully visible and the zero padding never
    touches it; the horizontal mirror maps [8, 24) onto itself; and
    the recipe's signal-destroying color ops (RandAugment, jitter,
    erasing, mixup) are disabled on the fabricated path only (see
    run_family).

    ``hard`` (round 5): a NON-SATURATING variant. At 100% top-1 the
    same-data differential proves less than it appears to (VERDICT r4
    weak #4) — a ceiling cannot discriminate a subtle QAT defect. With
    ``hard=h`` each image's square color gets one per-image additive
    offset ~ U(-h, +h) per channel (constant across the square, so
    pooling cannot average it away). Adjacent R/G levels are 50 apart
    (B: 60): for h > 25 the observation windows of neighbouring classes
    overlap and the BAYES-OPTIMAL accuracy drops below 100% by
    construction (numerically: h=28 → 81.2%, h=30 → 72.4%, h=32 →
    62.6% — nearest-level ML decode, 200k draws). Both stacks then
    train against a real irreducible error floor instead of a
    memorizable ceiling.
    """
    d = os.path.join(root, "cifar-100-python")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "FABRICATED"), "w") as f:
        f.write("written by scripts/cifar100_e2e.py — not real CIFAR\n")
        if hard:
            f.write(f"hard variant: square-color noise U(-{hard},{hard})\n")
    for split, n, off in (("train", train_n, 0), ("test", test_n, 1)):
        rng = np.random.default_rng(seed + off)
        labels = [int(i % 100) for i in range(n)]
        imgs = np.empty((n, 3, 32, 32), np.uint8)
        for i, lab in enumerate(labels):
            arr = rng.integers(0, 96, (32, 32, 3), dtype=np.uint8)
            color = np.asarray(fab_class_color(lab), np.int64)
            if hard:
                color = color + rng.integers(-hard, hard + 1, 3)
            arr[8:24, 8:24] = np.clip(color, 0, 255).astype(np.uint8)
            imgs[i] = arr.transpose(2, 0, 1)
        with open(os.path.join(d, split), "wb") as f:
            pickle.dump(
                {
                    b"data": imgs.reshape(n, 3072),
                    b"fine_labels": labels,
                    b"coarse_labels": [lab // 5 for lab in labels],
                    b"filenames": [
                        f"fab_{i:05d}.png".encode() for i in range(n)
                    ],
                },
                f,
            )
    with open(os.path.join(d, "meta"), "wb") as f:
        pickle.dump(
            {
                b"fine_label_names": [
                    f"class_{i:02d}".encode() for i in range(100)
                ],
                b"coarse_label_names": [
                    f"coarse_{i:02d}".encode() for i in range(20)
                ],
            },
            f,
        )


def run(tag, args, timeout=5400):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable] + args, cwd=REPO, capture_output=True,
        text=True, timeout=timeout,
    )
    dt = time.time() - t0
    print(f"--- {tag}: {dt:.1f}s rc={proc.returncode}")
    sys.stdout.flush()
    out = proc.stdout + proc.stderr
    if proc.returncode != 0:
        print(out[-4000:])
        raise SystemExit(f"{tag} failed")
    return out, dt


def run_family(opts, model, extra):
    work = os.path.join(opts.workdir, model)
    os.makedirs(work, exist_ok=True)
    ckpt = os.path.join(work, "checkpoint.pkl")
    artifact = os.path.join(work, "artifact.pkl")
    sim_npz = os.path.join(work, "sim_logits.npz")
    eng_npz = os.path.join(work, "engine_logits.npz")

    base = [
        "quant_train.py", "--model", model,
        "--data", opts.data, "--data-set", "CIFAR100",
        "--input-size", "32", "--nb-classes", "100",
        "--batch-size", str(opts.batch), "--num-workers", "2",
        "--lr", str(opts.lr), "--output-dir", work,
        "--drop-path", "0.0", "--seed", str(opts.seed),
    ] + extra
    if opts.fast_matmul:
        base += ["--fast-matmul"]
    if getattr(opts, "fabricated", False):
        # The fabricated signal is position+brightness-coded; the
        # reference CIFAR recipe's RandAugment-m9 / random-erasing /
        # mixup destroy exactly those cues, so the fabricated run
        # disables them (the REAL-data command line keeps the
        # reference defaults — this branch never fires then).
        base += ["--aa", "none", "--color-jitter", "0", "--reprob", "0",
                 "--mixup", "0", "--cutmix", "0"]

    report = {"model": model}
    _, dtt = run(
        f"{model} QAT {opts.epochs} epochs",
        base + ["--epochs", str(opts.epochs)],
    )
    report["train_s"] = round(dtt, 1)

    out, _ = run(
        f"{model} sim eval",
        base + ["--eval", "--resume", ckpt, "--dump-logits", sim_npz],
    )
    m = re.findall(r"val acc@1 ([0-9.]+)\s+acc@5 ([0-9.]+)", out)
    assert m, out[-2000:]
    report["sim_top1"], report["sim_top5"] = m[-1]

    conv = ["convert_model.py", "--model", model, "--checkpoint", ckpt,
            "--output", artifact, "--nb-classes", "100",
            "--input-size", "32"] + extra
    run(f"{model} convert (freeze)", conv)

    out, _ = run(f"{model} engine accuracy", [
        "evaluate_accuracy.py", "--model", model, "--artifact", artifact,
        "--data", opts.data, "--data-set", "CIFAR100",
        "--input-size", "32", "--nb-classes", "100",
        "--batch-size", str(opts.batch), "--num-workers", "2",
        "--dump-logits", eng_npz,
    ] + [a for a in extra if a not in ("--window-size", "4")])
    m = re.search(r"FINAL top1 ([0-9.]+) top5 ([0-9.]+)", out)
    assert m, out[-2000:]
    report["engine_top1"], report["engine_top5"] = m.group(1), m.group(2)

    sim = np.load(sim_npz)
    eng = np.load(eng_npz)
    np.testing.assert_array_equal(sim["labels"], eng["labels"])
    agree = float(
        np.mean(
            np.argmax(sim["logits"], -1) == np.argmax(eng["logits"], -1)
        )
    )
    report["per_image_decision_agree"] = agree
    report["top1_equal"] = report["sim_top1"] == report["engine_top1"]
    print(json.dumps(report))
    assert agree == 1.0, agree
    assert report["top1_equal"], (report["sim_top1"],
                                  report["engine_top1"])
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["deit", "swin", "both"],
                    default="deit")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--data", default="/tmp/cifar_data")
    ap.add_argument("--workdir", default="/tmp/cifar_e2e")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--train-n", type=int, default=2000)
    ap.add_argument("--test-n", type=int, default=500)
    ap.add_argument("--fast-matmul", action="store_true")
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed (data order / aug draws / init)")
    ap.add_argument("--hard", type=int, default=0,
                    help="non-saturating fabricated variant: per-image "
                         "square-color noise half-width (e.g. 30 → "
                         "Bayes ceiling in the 60–90%% band). Use a "
                         "fresh --data dir")
    opts = ap.parse_args()

    os.makedirs(opts.workdir, exist_ok=True)
    marker = os.path.join(opts.data, "cifar-100-python", "FABRICATED")
    real = os.path.isfile(
        os.path.join(opts.data, "cifar-100-python", "train")
    ) and not os.path.isfile(marker)
    if real and opts.hard:
        raise SystemExit("--hard writes a fabricated archive; --data "
                         "already holds real CIFAR bytes")
    if not real:
        print("cifar-100-python not found under --data; writing a "
              "FABRICATED archive in the real on-disk format "
              "(egress blocked on this box — see module docstring)"
              + (f" [hard variant, noise ±{opts.hard}]" if opts.hard
                 else ""))
        fabricate(opts.data, opts.train_n, opts.test_n, hard=opts.hard)
    print(f"data: {'REAL CIFAR-100' if real else 'FABRICATED (format-exact)'}"
          f" at {opts.data}")
    opts.fabricated = not real

    reports = []
    if opts.family in ("deit", "both"):
        reports.append(run_family(opts, "deit_tiny", []))
    if opts.family in ("swin", "both"):
        reports.append(run_family(opts, "swin_tiny", ["--window-size", "4"]))
    print("== summary ==")
    for r in reports:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
