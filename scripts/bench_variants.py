"""Time engine variants (batch-128 DeiT-S) without the FP32 baseline.

Usage: python scripts/bench_variants.py [variant ...]
Variants: default, exact, sm16, exact_sm16, pallas_sm, pallas_attn
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from ivit_tpu.deploy import build_vit_infer, freeze_vit
from ivit_tpu.models import create_model

BATCH = 128
ITERS = 30

VARIANTS = {
    "default": {},
    "exact": {"attn_v_mode": "exact"},
    "sm16": {"sm_int16": True},
    "exact_sm16": {"attn_v_mode": "exact", "sm_int16": True},
    "pallas_sm": {"pallas_ops": ("softmax",), "attn_v_mode": "exact"},
    "pallas_attn": {"pallas_ops": ("attention",)},
    "smsplit": {"sm_split": True},
    "smpack": {"sm_packed": True},
    "lingelu": {"pallas_ops": ("linear_gelu",)},
    "intsm": {"sm_int_lanes": True},
    "smsplit16": {"sm_split": True, "sm_int16": True},
    "attn2": {"pallas_ops": ("attention2",)},
    "attn2_lingelu": {"pallas_ops": ("attention2", "linear_gelu")},
    "proj4d": {"proj_4d": True},
    "resbar": {"res_split": True},
    "sm16_resbar": {"sm_int16": True, "res_split": True},
    "qkvt": {"qkv_t": True},
    "qkvtb": {"qkv_t": "bbatch"},
    "geluint": {"gelu_int_lanes": True},
    "geluint_intsm": {"gelu_int_lanes": True, "sm_int_lanes": True},
    "smpack_geluint": {"sm_packed": True, "gelu_int_lanes": True},
    "smpack_resbar": {"sm_packed": True, "res_split": True},
    "smpack_sm16": {"sm_packed": True, "sm_int16": True},
}


def time_fn(fn, x, iters=ITERS):
    float(fn(x)[0, 0])
    float(fn(x)[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    float(out[0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    import os

    from ivit_tpu.utils import profile_model_kwargs

    names = sys.argv[1:] or ["default"]
    mk = profile_model_kwargs()
    rng = jax.random.PRNGKey(0)
    # freezing through the relay is minutes; cache the random-weight
    # artifact on disk (latency is weight-agnostic). User-owned cache
    # dir (not world-writable /tmp — pickle) keyed on a format version:
    # bump V when freeze_vit's artifact layout changes so stale graphs
    # are never silently benchmarked.
    V = 2
    cache_dir = os.path.expanduser("~/.cache/ivit_tpu/bench")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(
        cache_dir,
        f"artifact_v{V}_sm{mk.get('softmax_bits', 16)}"
        f"_g{int(mk.get('gelu_stable', False))}.pkl",
    )
    import pickle

    if os.path.exists(cache):
        artifact = pickle.load(open(cache, "rb"))
    else:
        model = create_model("deit_small", **mk)
        sample = jax.random.normal(rng, (2, 224, 224, 3))
        variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
            jax.random.PRNGKey(1), sample
        )
        artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
        pickle.dump(artifact, open(cache, "wb"))
    images = jax.random.normal(rng, (BATCH, 224, 224, 3))
    for name in names:
        fn = jax.jit(build_vit_infer(artifact, **VARIANTS[name]))
        t = time_fn(fn, images)
        print(f"{name:14s} {t*1e3:7.2f} ms  {BATCH/t:8.1f} img/s")


if __name__ == "__main__":
    main()
