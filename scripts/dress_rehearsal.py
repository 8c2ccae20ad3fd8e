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
    ap.add_argument("--workdir", default="/tmp/rehearsal")
    opts = ap.parse_args()

    os.makedirs(opts.workdir, exist_ok=True)
    ckpt = os.path.join(opts.workdir, "checkpoint.pkl")
    artifact = os.path.join(opts.workdir, "artifact.pkl")

    base = [
        "quant_train.py", "--model", "deit_small",
        "--data-set", "SYNTHETIC", "--input-size", "224",
        "--nb-classes", "1000", "--batch-size", "64",
        "--loader-procs", "--num-workers", "2",
        "--output-dir", opts.workdir,
    ]
    if opts.fast_matmul:
        base += ["--fast-matmul"]
    if opts.sm8:
        base += ["--softmax-bits", "8"]

    report = {"config": {"fast_matmul": opts.fast_matmul, "sm8": opts.sm8}}

    _, dt0 = run("epoch 0 (fresh)", base + ["--epochs", "1"])
    report["epoch0_s"] = round(dt0, 1)

    _, dt1 = run("epoch 1 (resume)", base + ["--epochs", "2", "--resume", ckpt])
    report["epoch1_resume_s"] = round(dt1, 1)
    # epoch 1 excludes most of the compile; 512 train images feed it
    report["train_img_per_s_incl_loader"] = round(512 / dt1, 1)

    out, dte = run("sim eval", base + ["--eval", "--resume", ckpt])
    m = re.findall(r"val acc@1 ([0-9.]+)\s+acc@5 ([0-9.]+)", out)
    assert m, out[-2000:]
    sim_top1, sim_top5 = m[-1]
    report["sim_eval_s"] = round(dte, 1)

    conv = ["convert_model.py", "--model", "deit_small",
            "--checkpoint", ckpt, "--output", artifact]
    if opts.sm8:
        conv += ["--softmax-bits", "8"]
    _, dtc = run("convert (freeze)", conv)
    report["convert_s"] = round(dtc, 1)

    out, dta = run("engine accuracy", [
        "evaluate_accuracy.py", "--model", "deit_small",
        "--artifact", artifact, "--data-set", "SYNTHETIC",
        "--input-size", "224", "--nb-classes", "1000",
        "--batch-size", "128", "--num-workers", "2",
    ])
    m = re.search(r"FINAL top1 ([0-9.]+) top5 ([0-9.]+)", out)
    assert m, out[-2000:]
    eng_top1, eng_top5 = m.group(1), m.group(2)
    report["engine_eval_s"] = round(dta, 1)

    report["sim_top1"], report["engine_top1"] = sim_top1, eng_top1
    report["sim_top5"], report["engine_top5"] = sim_top5, eng_top5
    exact = (sim_top1 == eng_top1) and (sim_top5 == eng_top5)
    report["exact"] = exact
    print(json.dumps(report))
    if not exact:
        raise SystemExit(
            f"SIM {sim_top1}/{sim_top5} != ENGINE {eng_top1}/{eng_top5}"
        )
    print(f"DRESS REHEARSAL OK: sim == engine == {eng_top1} top-1 "
          f"({eng_top5} top-5) at 224² full geometry")


if __name__ == "__main__":
    main()
