"""Measured-structural roofline for the DeiT-S int8 engine (v5e-1).

VERDICT r3 item 5: turn the per-fusion accounting into a BOUND. Method:

1. Measure primitive rates on THIS chip:
     - stream BW: fused read+write elementwise pass (GB/s)
     - VPU rate: slope method — time a K-deep dependent integer op chain
       fused over a resident array at K=8 vs K=64; the slope isolates
       per-op-element cost from the (shared) HBM traffic
     - MXU: sustained int8 dot+requant at the engine's fc1 shape
2. Capture the shipping engine's own profiler trace and, for EVERY XLA
   event, parse all tensor shapes in its HLO one-liner → bytes moved
   (operands read + result written) → per-event HBM floor
   bytes/stream_BW.
3. Report: each top event's actual ms vs its HBM floor; the engine-wide
   analytic MXU floor (total MACs at datasheet peak and at the measured
   sustained rate).

Reading the table: an event's "HBM floor" assumes every operand is read
from and the result written to HBM at the measured stream rate. Events
BELOW 1.0× of that floor are proof XLA already beats naive streaming
(VMEM-resident producer→consumer handoffs — the bytes never touch HBM);
events ABOVE it are VPU-compute- or layout-bound. The engine-level
bound is therefore NOT Σfloors (which the engine legitimately beats)
but the sum of each event's EXCESS over its floor:

    recoverable ≤ Σ_events max(0, actual − HBM floor)

i.e. the most ANY spec-preserving optimization could recover is to
drive every above-floor event down to pure streaming speed while
keeping all of XLA's existing VMEM wins. That is the number printed
last, alongside the MXU floor (which bounds the matmul fraction).

Why NOT per-chain standalone timings (the first draft): a standalone
nonlinearity chain at engine shapes is HBM-bound on its own unfused
i32 carriers (~310 MB/app for the GELU chain) — it measures traffic the
engine never pays, because in-engine the chain fuses into the matmul
epilogue with s8 boundaries. Summing such timings gave a "floor" of
57.8 ms for an engine that measures 18.9 ms — standalone chain time is
an upper story, not a lower bound.

Usage: python scripts/roofline.py           # on the axon TPU
       IVIT_PROFILE_MODEL=swin_tiny python scripts/roofline.py
"""

import collections
import glob
import os
import re
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

LOGDIR = "/tmp/ivit_roofline_trace"
ITERS = 5
B = 128

DTYPE_BYTES = {
    "f32": 4, "f16": 2, "bf16": 2, "s32": 4, "u32": 4, "s16": 2,
    "u16": 2, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8,
}


def loop_time(fn, x0, reps=20, iters=5):
    """Mean seconds per fn application, fori_loop-chained in one jit
    (single-dispatch relay overhead would otherwise dominate)."""

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, reps, lambda i, x: fn(x, i), x0)

    out = chain(x0)
    float(jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chain(out)
    float(jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / (iters * reps)


def measure_stream_bw():
    """Fused read+write elementwise pass per dtype → GB/s."""
    rates = {}
    n_bytes = 256 * 1024 * 1024
    for name, dt, width in (
        ("s8", jnp.int8, 1), ("s16", jnp.int16, 2), ("f32", jnp.float32, 4)
    ):
        n = n_bytes // width
        x0 = jnp.zeros((n,), dt)
        t = loop_time(lambda x, i, d=dt: x + i.astype(d), x0)
        rates[name] = 2 * n * width / t
        print(f"stream {name}: {rates[name]/1e9:7.1f} GB/s")
    return rates


def measure_vpu_rate():
    """Per-op-element VPU rate by the slope method: one fused loop over
    a resident i32 array running a K-deep dependent integer chain
    (shift/xor/add — fold-resistant; a float mul/add chain constant-
    folds and measures nothing); t(K2)−t(K1) isolates compute from the
    shared read+write traffic. K-linearity is printed as the validity
    check."""
    n = 32 * 1024 * 1024
    x0 = jnp.zeros((n,), jnp.int32)

    def make(K):
        def f(x, i):
            y = x + i
            for k in range(K):
                if k % 3 == 0:
                    y = y ^ (y << 1)
                elif k % 3 == 1:
                    y = y + jnp.int32(0x9E3779B9 - 2**32)
                else:
                    y = y ^ (y >> 2)
            return y

        return f

    ts = {K: loop_time(make(K), x0, reps=8, iters=4) for K in (8, 32, 64)}
    rate = n * (64 - 8) / (ts[64] - ts[8])
    print(
        "VPU dependent-int-chain slope: "
        f"{rate/1e9:7.1f} Gop-elem/s "
        f"(K=8: {ts[8]*1e3:.2f}, K=32: {ts[32]*1e3:.2f}, "
        f"K=64: {ts[64]*1e3:.2f} ms)"
    )
    return rate


def measure_mxu():
    """Sustained int8 dot+requant rate at the engine's fc1 shape."""
    rng = np.random.default_rng(1)
    M, D, F = B * 197, 384, 1536
    x8 = jnp.asarray(rng.integers(-127, 128, (M, D)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-127, 128, (D, F)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-127, 128, (F, D)), jnp.int8)

    def pair(a, i):
        def dot_rq(a, w):
            acc = jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return jnp.clip(
                jnp.round(acc.astype(jnp.float32) * 7.3e-4), -128, 127
            ).astype(jnp.int8)

        a = (a + i.astype(jnp.int8)).astype(jnp.int8)
        return dot_rq(dot_rq(a, w1), w2)

    t = loop_time(pair, x8)
    rate = 2 * M * D * F / t
    print(f"MXU int8 dot+rq sustained: {rate/1e12:6.1f} TMAC/s")
    return rate


def engine_macs(cfg):
    """Total MXU MACs per engine iteration (batch B) from the config."""
    D, H = cfg["embed_dim"], cfg["num_heads"]
    p, img = cfg["patch_size"], cfg["img_size"]
    gh = img // p
    N = gh * gh + 1
    M = B * N
    F = 4 * D
    per_block = (
        M * D * 3 * D                     # qkv
        + 2 * B * H * N * N * (D // H)    # q@kT and @V
        + M * D * D                       # proj
        + M * D * F + M * F * D           # fc1, fc2
    )
    macs = (
        B * gh * gh * (p * p * 3) * D     # patch embed
        + cfg["depth"] * per_block
        + B * D * cfg.get("num_classes", 1000)
    )
    return macs


def _shape_bytes(dt, shape):
    w = DTYPE_BYTES.get(dt)
    if w is None:
        return 0
    elems = 1
    for d in shape.split(","):
        if d:
            elems *= int(d)
    return elems * w


def hlo_bytes(text):
    """Bytes moved by one HLO event: result written + operands read.

    The result is everything between '= ' and the opcode (tuples give
    several shapes); operands are the 'dtype[shape]{layout} %name'
    pairs inside the call parens, DEDUPED by operand name (a repeated
    operand is read once). Text after 'calls=' / metadata is ignored —
    counting every shape token in the line overcounts ~2× (measured:
    Σfloors 25.3 ms for an engine that runs 19.4 ms)."""
    text = text.split(", calls=")[0].split(", metadata=")[0]
    m = re.match(r"%\S+ = (.*?) ([a-z\-]+)\(", text)
    total = 0
    if m:
        for dt, shape in re.findall(r"([a-z0-9]+)\[([\d,]*)\]", m.group(1)):
            total += _shape_bytes(dt, shape)
        body = text[m.end():]
    else:
        body = text
    seen = set()
    for dt, shape, name in re.findall(
        r"([a-z0-9]+)\[([\d,]*)\](?:\{[^}]*\})?\s*%([\w.\-]+)", body
    ):
        if name in seen:
            continue
        seen.add(name)
        total += _shape_bytes(dt, shape)
    return total


def profile_engine():
    """Capture the shipping engine's trace; return per-aggregate rows."""
    from profile_engine import capture  # scripts/ on sys.path

    global LOGDIR
    import profile_engine as pe

    pe.LOGDIR = LOGDIR
    capture()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(glob.glob(LOGDIR + "/**/*.xplane.pb", recursive=True))
    xp = xplane_pb2.XSpace()
    xp.ParseFromString(open(xplanes[-1], "rb").read())
    plane = [p for p in xp.planes if "TPU" in p.name][0]
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    agg = collections.Counter()
    cnt = collections.Counter()
    full = {}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for e in line.events:
            name = ev_meta.get(e.metadata_id, "?")
            m = re.match(r"%([a-z_\-]+)[\.\d]* = ([^ ]+)", name)
            key = (m.group(1), m.group(2)) if m else (name[:40], "")
            agg[key] += e.duration_ps / 1e9 / ITERS
            cnt[key] += 1
            full[key] = name
    return agg, cnt, full


def main():
    print(f"backend: {jax.default_backend()}")
    bw = measure_stream_bw()
    vpu = measure_vpu_rate()
    mxu = measure_mxu()
    stream = max(bw.values())

    agg, cnt, full = profile_engine()
    total_ms = sum(agg.values())
    rows = []
    for key, ms in agg.items():
        gb = hlo_bytes(full[key]) * (cnt[key] // ITERS) / (
            cnt[key] // ITERS or 1
        )
        # per-iteration: each aggregate already divided by ITERS; bytes
        # are per single instance × instances per iter
        inst = max(1, cnt[key] // ITERS)
        floor_ms = hlo_bytes(full[key]) * inst / stream * 1e3
        rows.append((ms, floor_ms, inst, key, gb))
    rows.sort(reverse=True)

    print(f"\ntotal {total_ms:.2f} ms/iter; stream rate used "
          f"{stream/1e9:.0f} GB/s")
    print(f"{'event':30s} {'x':>4s} {'actual':>8s} {'HBMfloor':>9s} "
          f"{'x-of-floor':>10s}")
    shown = 0.0
    sum_floor = 0.0
    for ms, floor_ms, inst, key, _ in rows:
        sum_floor += floor_ms
        if ms > 0.15:
            shown += ms
            tag = f"{key[0][:22]} {key[1][:24]}"
            print(f"{tag:47s} {inst:4d} {ms:8.3f} {floor_ms:9.3f} "
                  f"{ms/max(floor_ms,1e-9):10.2f}")
    print(f"(rows ≥0.15 ms shown: {shown:.2f} of {total_ms:.2f} ms)")

    from ivit_tpu.models import create_model

    name = os.environ.get("IVIT_PROFILE_MODEL", "deit_small")
    MXU_PEAK = 197e12  # v5e datasheet: 394 TOPS int8 = 197 TMAC/s
    if not name.startswith("swin"):
        model = create_model(name)
        cfg = {
            "embed_dim": model.embed_dim, "num_heads": model.num_heads,
            "patch_size": model.patch_size, "img_size": 224,
            "depth": model.depth, "num_classes": model.num_classes,
        }
        macs = engine_macs(cfg)
        mxu_floor = macs / MXU_PEAK * 1e3          # hard (datasheet) floor
        mxu_sustained = macs / mxu * 1e3           # at measured micro rate
    else:
        mxu_floor = mxu_sustained = float("nan")

    recoverable = sum(max(0.0, ms - fl) for ms, fl, _, _, _ in rows)
    print(
        f"\nΣ per-event HBM floors (all-roundtrip bound): {sum_floor:.2f}"
        f" ms — engine actual {total_ms:.2f} ms = "
        f"{total_ms / sum_floor:.2f}× (below 1.0 ⇒ XLA already beats "
        f"naive streaming via VMEM residency)"
    )
    print(
        f"MXU floor @ datasheet 197 TMAC/s int8: {mxu_floor:.2f} ms"
        f"   (@ measured sustained {mxu/1e12:.0f} TMAC/s: "
        f"{mxu_sustained:.2f} ms)"
    )
    print(
        f"recoverable ≤ Σ max(0, actual−floor) = {recoverable:.2f} ms "
        f"({100 * recoverable / total_ms:.0f}% of the iteration) — the "
        f"hard cap on ANY spec-preserving optimization (drive every "
        f"above-floor event to stream rate, keep XLA's VMEM wins); "
        f"VPU slope rate {vpu/1e9:.0f} Gop-elem/s for chain op-count "
        f"cross-checks"
    )


if __name__ == "__main__":
    main()
