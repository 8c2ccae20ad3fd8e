#!/usr/bin/env python
"""Full-scale dress rehearsal of the production path (VERDICT r2 #3).

Runs the real command sequence a user would run, at real geometry
(DeiT-S, 224², 1000 classes), with the true recipe flags (default aa /
mixup / erasing), process-based loader workers, a mid-run resume, and
the full convert → integer-engine accuracy sweep:

    1. quant_train  epoch 0           (synthetic 512-image train set)
    2. quant_train  epoch 1           (--resume from the epoch-0 ckpt)
    3. quant_train  --eval            (simulator top-1 on the val sweep)
    4. convert_model                  (freeze → int8/int32 artifact)
    5. evaluate_accuracy              (integer-only engine, same sweep)
    6. assert sim top-1 == engine top-1 to the printed digit

The reference's analogue is quant_train.py:153-263 + the TVM
evaluate_accuracy harness. Wall-clock per phase and loader throughput
are printed and recorded in BENCH_NOTES.md.

Usage:  python scripts/dress_rehearsal.py [--fast-matmul] [--sm8]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(tag, args, timeout=2400):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable] + args, cwd=REPO, capture_output=True,
        text=True, timeout=timeout,
    )
    dt = time.time() - t0
    out = proc.stdout + proc.stderr
    print(f"--- {tag}: {dt:.1f}s rc={proc.returncode}")
    sys.stdout.flush()
    if proc.returncode != 0:
        print(out[-4000:])
        raise SystemExit(f"{tag} failed")
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast-matmul", action="store_true")
    ap.add_argument("--sm8", action="store_true",
                    help="rehearse at softmax_bits=8 (the reference's "
                         "TVM deploy precision)")
    ap.add_argument("--gelu-stable", action="store_true",
                    help="rehearse the elementwise-stable ShiftGELU mode")
    ap.add_argument("--nb-classes", default=1000, type=int,
                    help="1000 = the production geometry; 64 keeps the "
                         "geometry but makes the 512-image synthetic "
                         "task learnable in 2 epochs, so the final "
                         "sim == engine equality is non-trivial")
    ap.add_argument("--lr", default="",
                    help="override quant_train's default lr (1e-6, the "
                         "reference's fine-tune lr — from-scratch "
                         "synthetic runs want ~5e-4)")
    ap.add_argument("--workdir", default="/tmp/rehearsal")
    opts = ap.parse_args()

    os.makedirs(opts.workdir, exist_ok=True)
    ckpt = os.path.join(opts.workdir, "checkpoint.pkl")
    artifact = os.path.join(opts.workdir, "artifact.pkl")

    base = [
        "quant_train.py", "--model", "deit_small",
        "--data-set", "SYNTHETIC", "--input-size", "224",
        "--nb-classes", str(opts.nb_classes), "--batch-size", "64",
        "--loader-procs", "--num-workers", "2",
        "--output-dir", opts.workdir,
    ]
    if opts.fast_matmul:
        base += ["--fast-matmul"]
    if opts.sm8:
        base += ["--softmax-bits", "8"]
    if opts.gelu_stable:
        base += ["--gelu-stable"]
    if opts.lr:
        base += ["--lr", opts.lr]

    report = {"config": {"fast_matmul": opts.fast_matmul, "sm8": opts.sm8,
                         "gelu_stable": opts.gelu_stable,
                         "nb_classes": opts.nb_classes,
                         "lr": opts.lr or "default"}}

    _, dt0 = run("epoch 0 (fresh)", base + ["--epochs", "1"])
    report["epoch0_s"] = round(dt0, 1)

    _, dt1 = run("epoch 1 (resume)", base + ["--epochs", "2", "--resume", ckpt])
    report["epoch1_resume_s"] = round(dt1, 1)
    # epoch 1 excludes most of the compile; 512 train images feed it
    report["train_img_per_s_incl_loader"] = round(512 / dt1, 1)

    sim_npz = os.path.join(opts.workdir, "sim_logits.npz")
    eng_npz = os.path.join(opts.workdir, "engine_logits.npz")
    out, dte = run("sim eval", base + ["--eval", "--resume", ckpt,
                                       "--dump-logits", sim_npz])
    m = re.findall(r"val acc@1 ([0-9.]+)\s+acc@5 ([0-9.]+)", out)
    assert m, out[-2000:]
    sim_top1, sim_top5 = m[-1]
    report["sim_eval_s"] = round(dte, 1)

    conv = ["convert_model.py", "--model", "deit_small",
            "--checkpoint", ckpt, "--output", artifact,
            "--nb-classes", str(opts.nb_classes)]
    if opts.sm8:
        conv += ["--softmax-bits", "8"]
    if opts.gelu_stable:
        conv += ["--gelu-stable"]
    _, dtc = run("convert (freeze)", conv)
    report["convert_s"] = round(dtc, 1)

    out, dta = run("engine accuracy", [
        "evaluate_accuracy.py", "--model", "deit_small",
        "--artifact", artifact, "--data-set", "SYNTHETIC",
        "--input-size", "224", "--nb-classes", str(opts.nb_classes),
        "--batch-size", "128", "--num-workers", "2",
        "--dump-logits", eng_npz,
    ])
    m = re.search(r"FINAL top1 ([0-9.]+) top5 ([0-9.]+)", out)
    assert m, out[-2000:]
    eng_top1, eng_top5 = m.group(1), m.group(2)
    report["engine_eval_s"] = round(dta, 1)

    report["sim_top1"], report["engine_top1"] = sim_top1, eng_top1
    report["sim_top5"], report["engine_top5"] = sim_top5, eng_top5
    exact = (sim_top1 == eng_top1) and (sim_top5 == eng_top5)
    report["exact"] = exact

    # Per-image check: aggregate top-1 equality is trivially satisfiable
    # (e.g. 0.000 == 0.000 for an undertrained model); the real claim is
    # that the int8 engine reproduces the simulator's DECISION on every
    # image. Logits match to a few head-scale LSBs on almost all images;
    # a universal LSB bound is impossible from a float simulator (its
    # f32-HIGHEST dots round in a jit-context/batch-shape-dependent
    # order, so exact .5-tie inputs can flip 1 carrier LSB early and
    # amplify — see tests/test_dump_logits.py for the measured case).
    import numpy as np
    import pickle

    sim = np.load(sim_npz)
    eng = np.load(eng_npz)
    assert sim["logits"].shape == eng["logits"].shape, (
        sim["logits"].shape, eng["logits"].shape)
    np.testing.assert_array_equal(sim["labels"], eng["labels"])
    with open(artifact, "rb") as f:
        head_scale = float(
            np.max(pickle.load(f)["head"]["out_scale"]))
    row_err = np.abs(sim["logits"] - eng["logits"]).max(axis=1)
    dmax = float(row_err.max())
    agree = int(
        (sim["logits"].argmax(-1) == eng["logits"].argmax(-1)).sum())
    n_img = len(sim["labels"])
    report["n_images"] = n_img
    report["argmax_agree"] = agree
    report["max_abs_dlogit"] = dmax
    report["max_dlogit_in_head_lsbs"] = round(dmax / head_scale, 3)
    report["frac_within_3lsb"] = round(
        float((row_err <= 3 * head_scale).mean()), 4)
    per_image_ok = (
        agree == n_img
        and report["frac_within_3lsb"] >= 0.95
        and dmax <= 0.05
    )
    report["per_image_ok"] = per_image_ok
    print(json.dumps(report))
    if not exact:
        raise SystemExit(
            f"SIM {sim_top1}/{sim_top5} != ENGINE {eng_top1}/{eng_top5}"
        )
    if not per_image_ok:
        raise SystemExit(
            f"per-image mismatch: argmax agree {agree}/{n_img}, "
            f"max|Δlogit| {dmax:.6g} ({dmax/head_scale:.2f} head LSBs)"
        )
    print(f"DRESS REHEARSAL OK: sim == engine == {eng_top1} top-1 "
          f"({eng_top5} top-5) at 224² full geometry; per-image argmax "
          f"{agree}/{n_img}, {100*report['frac_within_3lsb']:.1f}% of "
          f"images within 3 head LSBs (max {dmax/head_scale:.2f})")


if __name__ == "__main__":
    main()
