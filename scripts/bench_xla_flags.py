"""Sweep per-compile XLA TPU compiler options on the shipping engine.

The round-2/3/4 lever sweeps covered every *graph-level* knob (softmax
carriers, GELU lanes, attention modes, layouts, Pallas kernels) — but
never the compiler's own budgets. Options like
``xla_tpu_scoped_vmem_limit_kib`` change XLA's fusion/tiling decisions
for the SAME HLO. Same program does NOT guarantee same bits — a
different VMEM/fusion budget can retile f32 reductions and change
accumulation order — so each variant's logits are checked against the
default compile (which is pinned first and must succeed), and only
bit-exact variants are eligible for the final "best" pick;
non-bit-exact ones are timed but reported separately.

Usage: python scripts/bench_xla_flags.py [--model deit_small] [--batch 128]
Prints one line per variant; unknown/rejected options are recorded and
skipped (the relay's compile server decides what it accepts).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from ivit_tpu.utils import enable_compile_cache

enable_compile_cache()

from ivit_tpu.deploy import build_vit_infer, freeze_vit
from ivit_tpu.models import create_model

VARIANTS = [
    ("default", None),
    # v5e VMEM is 128 MiB/core; the scoped limit bounds what fusions may
    # hold resident. Sweep both directions of the default.
    ("vmem16m", {"xla_tpu_scoped_vmem_limit_kib": "16384"}),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # reduce+broadcast fusion off: the requant chains end in broadcasted
    # scale multiplies; rwb fusion can pessimize their tiling.
    ("no_rwb", {"xla_tpu_rwb_fusion": "false"}),
    # loop-invariant code motion size budget.
    ("licm2x", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
]


def time_fn(fn, x, iters=30, reps=3):
    float(np.asarray(fn(x))[0, 0])
    float(np.asarray(fn(x))[0, 0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        float(np.asarray(out)[0, 0])
        times.append((time.perf_counter() - t0) / iters)
    return min(times), times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_small")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    model = create_model(args.model, softmax_bits=8, gelu_stable=True)
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (2, 224, 224, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        jax.random.PRNGKey(1), sample
    )
    artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
    images = jax.random.normal(rng, (args.batch, 224, 224, 3))

    infer = build_vit_infer(artifact)
    lowered = jax.jit(infer).lower(images)

    # Pin the bit-exactness baseline to the DEFAULT compile, outside the
    # sweep's try/except: if the default itself is rejected there is no
    # meaningful reference and the sweep must abort rather than silently
    # promote some other variant to baseline (ADVICE r4).
    assert VARIANTS[0] == ("default", None)
    compiled_default = lowered.compile(compiler_options=None)
    ref_logits = np.asarray(compiled_default(images))

    results = []  # (name, img/s, bitexact)
    for name, opts in VARIANTS:
        try:
            t0 = time.perf_counter()
            compiled = (
                compiled_default if opts is None
                else lowered.compile(compiler_options=opts)
            )
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 - sweep must survive rejects
            print(f"{name:10s} REJECTED: {type(e).__name__}: {e}")
            continue
        t, times = time_fn(compiled, images, iters=args.iters)
        out = np.asarray(compiled(images))
        bitexact = bool(np.array_equal(out, ref_logits))
        img_s = args.batch / t
        results.append((name, img_s, bitexact))
        print(
            f"{name:10s} {t * 1e3:7.2f} ms/iter  {img_s:8.1f} img/s  "
            f"(compile {compile_s:.1f}s, reps "
            f"{['%.2f' % (x * 1e3) for x in times]}, "
            f"bitexact_vs_default={bitexact})"
        )
        sys.stdout.flush()

    exact = [r for r in results if r[2]]
    if exact:
        best = max(exact, key=lambda r: r[1])
        base = {r[0]: r[1] for r in results}.get("default")
        print(
            f"\nbest (bit-exact only): {best[0]} {best[1]:.1f} img/s"
            + (f" ({100 * (best[1] / base - 1):+.1f}% vs default)"
               if base else "")
        )
    divergent = [r for r in results if not r[2]]
    if divergent:
        print("excluded from 'best' (logits diverge from default): "
              + ", ".join(f"{n} {v:.1f} img/s" for n, v, _ in divergent))


if __name__ == "__main__":
    main()
