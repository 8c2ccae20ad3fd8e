"""Capture a TPU profiler trace of the int8 engine and dump per-op times.

Usage: python scripts/profile_engine.py [logdir] [--fp32]
Parses the resulting xplane.pb with tensorflow's profiler convert tools
and prints the op breakdown sorted by self time.
"""

import glob
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

LOGDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ivit_trace"


def capture():
    import os as _os

    from ivit_tpu.deploy import build_vit_infer, freeze_vit
    from ivit_tpu.deploy.swin_engine import build_swin_infer, freeze_swin
    from ivit_tpu.models import create_model

    from ivit_tpu.utils import profile_model_kwargs

    name = _os.environ.get("IVIT_PROFILE_MODEL", "deit_small")
    is_swin = name.startswith("swin")
    mk = profile_model_kwargs(is_swin)
    model = create_model(name, **mk)
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (2, 224, 224, 3))
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        jax.random.PRNGKey(1), sample
    )
    freeze = freeze_swin if is_swin else freeze_vit
    build = build_swin_infer if is_swin else build_vit_infer
    artifact = freeze(model, jax.tree.map(np.asarray, variables))
    images = jax.random.normal(rng, (128, 224, 224, 3))

    kw = {}
    if _os.environ.get("IVIT_PROFILE_VARIANT"):
        from scripts.bench_variants import VARIANTS

        kw = VARIANTS[_os.environ["IVIT_PROFILE_VARIANT"]]
    fn = jax.jit(build(artifact, **kw))
    float(fn(images)[0, 0])
    float(fn(images)[0, 0])
    with jax.profiler.trace(LOGDIR):
        for _ in range(5):
            out = fn(images)
        float(out[0, 0])


def analyze(iters=5, top=35, full_top=8):
    """Parse the xplane.pb directly (the tensorboard profile plugin in
    this image mismatches its tensorflow) and print XLA-op aggregates."""
    import collections
    import re

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(glob.glob(LOGDIR + "/**/*.xplane.pb", recursive=True))
    assert xplanes, f"no xplane under {LOGDIR}"
    xp = xplane_pb2.XSpace()
    xp.ParseFromString(open(xplanes[-1], "rb").read())
    plane = [p for p in xp.planes if "TPU" in p.name or "GPU" in p.name][0]
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
            agg[key] += e.duration_ps / 1e9
            cnt[key] += 1
            full[key] = name
    total = sum(agg.values())
    print(f"total {total/iters:.3f} ms/iter")
    for key, t in agg.most_common(top):
        kind, sig = key
        print(
            f"{t/iters:8.4f} ms/iter  x{cnt[key]//iters:4d}  {kind:26s} "
            f"{sig[:70]}"
        )
    print("\n--- full text of top entries ---")
    for key, t in agg.most_common(full_top):
        print(f"== {t/iters:.4f} ms/iter ==\n{full[key][:500]}\n")


if __name__ == "__main__":
    capture()
    analyze()
