"""FULL-SCALE model differential vs the reference's executable graph.

tests/test_ref_model_differential.py proves the wiring at toy scale
(img 32, D 32, depth 2). This script runs the same three-way invariant
set at PRODUCTION scale — deit_tiny 224² (D 192, depth 12, 197 tokens,
1000 classes) and swin_tiny 224² (window 7, depths 2-2-6-2) — where
carrier-tie drift, EMA range dynamics, and the pos-embed/cls handling
meet realistic value distributions:

  1. every live QuantAct's EMA (min, max) matches BY NAME between the
     reference torch graph and our SIM after identical calibration
     (range-relative drift < 5%), EXCEPT post-GELU nodes caught by the
     ShiftGELU division-cliff — a genuine discontinuity of the spec
     itself (quant_modules.py:437-439: factor = floor(2^31/Σexp) jumps
     k→k±1 on a 1-LSB input move); those must pass the mechanism check
     (both sides' recorded maxima inside the spec's own cliff envelope
     for their inputs);
  2. NON-INFERIORITY on logits: rms(sim − fp32-oracle) ≤ 1.25 ×
     rms(ref − fp32-oracle) on identical weights/stats/inputs (the raw
     ref↔sim delta is reported; a fixed fraction-of-floor threshold is
     a coin flip between two independent int8 implementations), plus
     argmax equality on every margin-decided image (ref's top-2 margin
     > the per-image ref↔sim delta — with trained weights this is every
     image; with random-init heads sub-noise flips are expected);
  3. our freeze → int8 deploy engine reproduces the SIM logits at this
     scale (the sim↔deploy invariant on a full-size, realistically
     distributed artifact).

Invariant 3 is platform-split: on CPU the float simulator's `round(x/s)`
and the engine's `floor(x·r + 0.5)` resolve exact .5 requant ties
through different lowerings (CLAUDE.md; closed on-device in round 2 —
engine._scale pins every ratio on the TPU), and at depth 12 one early
tie-flip amplifies to O(10³) head-LSBs. So the CPU leg asserts the
decision-level invariant (per-image argmax) and REPORTS the LSB
distance; `--save-bundle` then persists {variables, x_eval, cpu sim
logits} and `scripts/full_scale_tpu_parity.py` re-freezes + re-runs
both sides on the real chip, where the few-LSB bound is asserted.

Weights: ``--checkpoint PATH`` loads a real pretrained torch checkpoint
(deit_tiny_patch16_224-a1311bcf.pth / swin_tiny_patch4_window7_224.pth,
the files the reference's own factories fetch —
/root/reference/models/vit_quant.py:296-302, swin_quant.py:578-582).
This box has zero network egress (DNS resolution fails; recorded in
BENCH_NOTES.md), so the default is the reference model's OWN
initialization (timm-style trunc_normal — the distribution its training
starts from), exported from the torch model so both sides run literally
identical parameters.

Inputs: synthetic photographs (the class-coded SyntheticDataset) pushed
through the real eval transform (resize + center-crop + ImageNet
normalize), i.e. the value distribution the deployed model actually
sees, not unit normals.

Run on CPU (torch has no TPU):
    JAX_PLATFORMS=cpu python scripts/full_scale_differential.py \
        --family vit --calib-batches 2 --batch 4 --eval-batch 8

Reference: /root/reference/models/vit_quant.py:152-310,
swin_quant.py:419-564, quant_modules.py:100-206.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

# must run on CPU: torch is CPU-only and the axon relay would be wasted
# on compile-once forwards (CLAUDE.md: env var alone is too late).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

_REF_ROOT = "/root/reference"


def _ref_models():
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if _REF_ROOT not in sys.path:
        sys.path.insert(0, _REF_ROOT)
    import models as ref_models  # the reference package

    return ref_models


def _images(n, seed=0):
    """Realistic eval-distribution inputs: synthetic photographs through
    the real resize/crop/normalize eval transform."""
    from ivit_tpu.data import eval_transform
    from ivit_tpu.data.datasets import SyntheticDataset

    ds = SyntheticDataset(n=n, size=256, num_classes=1000, seed=seed)
    return np.stack(
        [eval_transform(ds.load(i)[0], size=224) for i in range(n)]
    ).astype(np.float32)


def _nchw(x):
    import torch

    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _vit_name_map(depth):
    pairs = {
        "qact_input": ("qact_input",),
        "patch_embed.qact": ("qact_embed",),
        "qact_pos": ("qact_pos",),
        "qact1": ("qact1",),
        "qact2": ("qact2",),
    }
    for i in range(depth):
        b = f"blocks_{i}"
        for r, o in (
            ("qact1", (b, "qact1")), ("qact2", (b, "qact2")),
            ("qact3", (b, "qact3")), ("qact4", (b, "qact4")),
            ("attn.qact1", (b, "attn", "qact1")),
            ("attn.qact_attn1", (b, "attn", "qact_attn1")),
            ("attn.qact2", (b, "attn", "qact2")),
            ("attn.qact3", (b, "attn", "qact3")),
            ("mlp.qact1", (b, "mlp", "qact1")),
            ("mlp.qact2", (b, "mlp", "qact2")),
            ("mlp.qact_gelu", (b, "mlp", "qact_gelu")),
        ):
            pairs[f"blocks.{i}.{r}"] = o
    return pairs


def _swin_name_map(depths):
    pairs = {
        "qact_input": ("qact_input",),
        "patch_embed.qact_before_norm": ("qact_before_norm",),
        "patch_embed.qact": ("qact_embed",),
        "qact1": ("qact1",),
        "qact2": ("qact2",),
        "qact3": ("qact3",),
    }
    for i, depth in enumerate(depths):
        for j in range(depth):
            b = f"layers_{i}_blocks_{j}"
            src = f"layers.{i}.blocks.{j}"
            for leaf in ("qact1", "qact2", "qact3", "qact4"):
                pairs[f"{src}.{leaf}"] = (b, leaf)
            for leaf in (
                "qact1", "qact_attn1", "qact_table", "qact2", "qact3",
                "qact4",
            ):
                pairs[f"{src}.attn.{leaf}"] = (b, "attn", leaf)
            for leaf in ("qact1", "qact2", "qact_gelu"):
                pairs[f"{src}.mlp.{leaf}"] = (b, "mlp", leaf)
        if i < len(depths) - 1:
            pairs[f"layers.{i}.downsample.qact1"] = (
                f"layers_{i}_downsample", "qact1",
            )
            pairs[f"layers.{i}.downsample.qact2"] = (
                f"layers_{i}_downsample", "qact2",
            )
    return pairs


def _compare_stats(ref_model, variables, name_map, out):
    ref_stats = {
        name: (float(mod.min_val), float(mod.max_val))
        for name, mod in ref_model.named_modules()
        if mod.__class__.__name__ == "QuantAct"
        and float(mod.act_scaling_factor) != 0.0
    }
    ours = jax.tree.map(np.asarray, variables["quant_stats"])
    missing = set(ref_stats) ^ set(name_map)
    assert not missing, f"QuantAct name-map mismatch: {missing}"
    # Drift normalized by the RANGE (max−min), not per-component |value|:
    # what the stat controls is the quantization scale = range/255, and
    # a post-GELU min_val sits near zero, where a per-component relative
    # metric divides dust by dust (measured: 32% "drift" on a min_val
    # that moves by 1e-3 of the range).
    rows = []
    for ref_name, path in name_map.items():
        node = ours
        for k in path:
            node = node[k]
        got = np.array([float(node["min_val"]), float(node["max_val"])])
        want = np.array(ref_stats[ref_name])
        rng = float(want[1] - want[0]) + 1e-12
        rel = float(np.max(np.abs(got - want)) / rng)
        rows.append((rel, ref_name, got, want))
    rows.sort(reverse=True)
    worst = (rows[0][1], rows[0][0])
    out["n_quantacts"] = len(name_map)
    out["worst_stat_rel"] = worst[1]
    out["worst_stat_name"] = worst[0]
    print(
        f"  EMA stats: {len(name_map)} live QuantActs matched by name; "
        f"worst range-relative drift {worst[1]:.3%} at {worst[0]}"
    )
    for rel, name, got, want in rows[:3]:
        print(
            f"    {name}: ours (min {got[0]:+.5f}, max {got[1]:+.5f}) "
            f"ref (min {want[0]:+.5f}, max {want[1]:+.5f})  "
            f"drift {rel:.3%} of range"
        )
    if os.environ.get("FSD_DUMP_STATS"):
        print("  -- full drift table (graph order) --")
        for ref_name, path in name_map.items():
            row = next(r for r in rows if r[1] == ref_name)
            rel, _, got, want = row
            print(
                f"    {rel:8.3%}  {ref_name:42s} "
                f"ours({got[0]:+.4f},{got[1]:+.4f}) "
                f"ref({want[0]:+.4f},{want[1]:+.4f})"
            )
    # carrier-tie dust compounds with depth; a wiring bug is O(100%).
    # One legitimate mechanism exceeds dust: the ShiftGELU spec's own
    # division cliff. The reference computes the sigmoid as
    #   factor = floor((2^31−1)/(exp0+exp_max)); σ_int = floor(exp·f/2^24)
    # (quant_modules.py:437-439), and at scales where exp0+exp_max sits
    # near 2^31/k the floor makes σ jump ~1/k — a 1-LSB upstream tie
    # difference flips k=3↔4 and moves the post-GELU max by ~30% while
    # every neighbouring stat agrees to dust (measured at swin_tiny
    # stage 1: ref sum 537,919,488 → factor 3, σ=85/128; ours
    # 536,346,624 → factor 4, σ=114/128). Both sides are bit-faithful
    # to the spec; the drift is the spec's discontinuity, not a wiring
    # bug. So: any offender > 5% must (a) be a post-GELU node and
    # (b) pass the MECHANISM CHECK — our DEPLOY op, fed each side's own
    # recorded GELU-input stats, must reproduce that side's recorded
    # post-GELU max (σ for the row-max element depends only on x_max,
    # so a 1-element row reproduces the in-model value exactly).
    import math

    from ivit_tpu.ops import DEPLOY, shiftgelu

    for rel, name, got, want in rows:
        if rel < 0.05:
            continue
        assert name.endswith("mlp.qact1"), (name, rel)
        gin = name.replace("mlp.qact1", "mlp.qact_gelu")
        node = ours
        for k in name_map[gin]:
            node = node[k]
        our_in = (float(node["min_val"]), float(node["max_val"]))
        ref_in = ref_stats[gin]
        for side, (mn, mx), out_max in (
            ("ref", ref_in, want[1]), ("ours", our_in, got[1]),
        ):
            # The recorded stats are EMA blends across calib batches and
            # each batch's x_int_max can sit on either side of the cliff,
            # so the recorded max must lie inside the ENVELOPE of the
            # spec's own predictions over a ±2-LSB x_int_max window
            # (the cliff flip is caused by exactly such 1-LSB moves).
            s = max(abs(mn), abs(mx)) / 127.0
            q0 = float(np.round(mx / s))
            cands = []
            for d in (-2, -1, 0, 1, 2):
                o, so = shiftgelu(
                    jnp.asarray([[np.float32(q0 + d)]]), np.float32(s),
                    out_bits=8, interp=DEPLOY,
                    static_p=math.ceil(1.0 / (1.702 * s)),
                )
                cands.append(
                    float(np.asarray(o)[0, 0]) * float(np.max(so))
                )
            lo, hi = min(cands) - 0.03, max(cands) + 0.03
            assert lo <= out_max <= hi, (name, side, out_max, cands)
        print(
            f"    {name}: {rel:.1%} drift EXPLAINED (ShiftGELU division-"
            f"cliff: both sides' recorded maxima lie in the spec's own "
            f"cliff envelope for their inputs)"
        )
    return worst


def _report_logits(tag, ref_logits, our_logits, float_logits, out):
    """Acceptance at full scale: NON-INFERIORITY against the shared FP32
    oracle. ref and sim are two *independent* int8 implementations; each
    sits ~one quantization-noise floor from the FP32 model on the same
    weights, so their mutual max|Δ| legitimately ranges anywhere up to
    the sum of the two floors (measured across seeds: 0.47×–1.74× of one
    floor) — a fixed fraction-of-floor threshold on ref↔sim is a coin
    flip, not an invariant. What a wiring bug actually does is blow up
    OUR distance from the oracle (scale handoff errors are O(spread), not
    O(floor)) or flip predictions; so the asserted invariants are
      (a) per-image argmax identical to the reference, and
      (b) rms(sim − fp32) ≤ 1.25 × rms(ref − fp32): our quantization
          error is no worse than the reference's own on identical
          weights, stats, and inputs.
    The raw ref↔sim delta is still reported for the record."""
    spread = float(np.std(ref_logits))
    delta = float(np.max(np.abs(ref_logits - our_logits)))

    def rms(a):
        return float(np.sqrt(np.mean((a - float_logits) ** 2)))

    rms_ref, rms_sim = rms(ref_logits), rms(our_logits)
    same = np.argmax(ref_logits, -1) == np.argmax(our_logits, -1)
    agree = float(np.mean(same))
    # argmax is only a meaningful invariant on images whose decision is
    # DECIDED at this noise level: with random-init weights the top-2
    # margin can sit below the int8 noise, where two independent int8
    # implementations legitimately flip (measured: swin random-init
    # spread 0.48, noise 0.08, 1/8 images flipped). Assert exact
    # agreement wherever ref's own top-2 margin exceeds the measured
    # per-image ref↔sim delta; with trained weights margins dwarf the
    # noise and this reduces to exact agreement on every image.
    srt = np.sort(ref_logits, -1)
    margin = srt[:, -1] - srt[:, -2]
    d_img = np.max(np.abs(ref_logits - our_logits), -1)
    decided = margin > d_img
    out["logit_spread"] = spread
    out["logit_max_delta"] = delta
    out["rms_ref_vs_fp32"] = rms_ref
    out["rms_sim_vs_fp32"] = rms_sim
    out["argmax_agree"] = agree
    out["argmax_agree_decided"] = float(np.mean(same[decided]))
    out["n_decided"] = int(decided.sum())
    print(
        f"  {tag} logits: max|Δ|={delta:.5f} (spread {spread:.3f}); "
        f"rms-vs-fp32 ref {rms_ref:.5f} sim {rms_sim:.5f} "
        f"(ratio {rms_sim / rms_ref:.2f}); argmax agreement {agree:.1%} "
        f"({int(decided.sum())}/{len(same)} margin-decided: "
        f"{float(np.mean(same[decided])):.1%})"
    )
    assert same[decided].all(), (margin, d_img, same)
    assert rms_sim <= 1.25 * rms_ref, (rms_sim, rms_ref)


def _check_sim_deploy(dep_logits, our_logits, artifact, out, t0):
    """Invariant 3. Always: per-image argmax. On the TPU additionally the
    few-LSB bound; on CPU the LSB distance is reported only (documented
    requant-tie lowering split — see module docstring; the TPU leg is
    scripts/full_scale_tpu_parity.py)."""
    dd = float(np.max(np.abs(dep_logits - our_logits)))
    head_scale = float(np.max(artifact["head"]["out_scale"]))
    on_tpu = jax.default_backend() not in ("cpu",)
    out["sim_deploy_max_delta"] = dd
    out["sim_deploy_head_scale"] = head_scale
    out["sim_deploy_platform"] = jax.default_backend()
    print(
        f"  sim↔deploy[{jax.default_backend()}]: max|Δ|={dd:.6g} "
        f"({dd / head_scale:.1f} head-scale LSBs; {time.time() - t0:.0f}s)"
        + ("" if on_tpu else "  [report-only: CPU tie-lowering split]")
    )
    same = np.argmax(dep_logits, -1) == np.argmax(our_logits, -1)
    if on_tpu:
        np.testing.assert_array_equal(same, True)
        assert dd <= 4 * head_scale, (dd, head_scale)
    else:
        # CPU tie-lowering split: decisions are only asserted where the
        # sim's own top-2 margin exceeds the per-image sim↔deploy delta
        # (same rule as _report_logits; strict equality on the TPU leg).
        srt = np.sort(our_logits, -1)
        margin = srt[:, -1] - srt[:, -2]
        d_img = np.max(np.abs(dep_logits - our_logits), -1)
        assert same[margin > d_img].all(), (margin, d_img, same)


def _maybe_bundle(args, family, variables, x_eval, our_logits):
    if not args.save_bundle:
        return
    import pickle

    path = f"{args.save_bundle.rstrip('/')}/{family}.pkl"
    with open(path, "wb") as f:
        pickle.dump(
            {
                "family": family,
                "variables": jax.tree.map(np.asarray, variables),
                "x_eval": np.asarray(x_eval),
                "cpu_sim_logits": np.asarray(our_logits),
            },
            f,
        )
    print(f"  bundle → {path}")


_VIT_GEOMETRIES = {
    # our registry name → (reference factory, depth)
    "deit_tiny": ("deit_tiny_patch16_224", 12),
    "deit_small": ("deit_small_patch16_224", 12),
    "deit_base": ("deit_base_patch16_224", 12),
    "vit_base": ("vit_base_patch16_224", 12),
    "vit_large": ("vit_large_patch16_224", 24),
}


def run_vit(args):
    import torch

    from ivit_tpu.deploy import build_vit_infer, freeze_vit
    from ivit_tpu.models import create_model
    from ivit_tpu.models.import_torch import (
        merge_params,
        torch_vit_to_params,
    )

    ref_factory, depth = _VIT_GEOMETRIES[args.model]
    out = {"family": f"{args.model}_224"}
    ref = _ref_models()
    t0 = time.time()
    torch.manual_seed(0)  # reference-init + droppath draws reproducible
    ref_model = getattr(ref.vit_quant, ref_factory)()
    if args.checkpoint:
        ckpt = torch.load(args.checkpoint, map_location="cpu")
        ref_model.load_state_dict(ckpt.get("model", ckpt), strict=False)
        out["weights"] = args.checkpoint
        out["weights_kind"] = "trained"
    else:
        out["weights"] = "reference-init (trunc_normal; egress blocked)"
        out["weights_kind"] = "init"
    sd = {
        k: v.numpy()
        for k, v in ref_model.state_dict().items()
        if not any(
            t in k
            for t in ("min_val", "max_val", "scaling_factor", "_integer")
        )
    }

    calib = [
        _images(args.batch, seed=100 + i)
        for i in range(args.calib_batches)
    ]
    x_eval = _images(args.eval_batch, seed=999)

    ref_model.train()
    with torch.no_grad():
        for b in calib:
            ref_model(_nchw(b))
    ref.model_utils.freeze_model(ref_model)
    ref_model.eval()
    with torch.no_grad():
        ref_logits = ref_model(_nchw(x_eval)).numpy()
    print(f"  reference torch pass done in {time.time() - t0:.0f}s")

    t0 = time.time()
    model = create_model(args.model)
    x0 = jnp.zeros((1, 224, 224, 3))
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=True)
    )(jax.random.PRNGKey(0), x0)
    merged = merge_params(
        jax.tree.map(np.asarray, variables["params"]),
        torch_vit_to_params(sd),
    )
    variables = {
        "params": merged,
        "quant_stats": jax.tree.map(
            lambda v: jnp.zeros_like(v), variables["quant_stats"]
        ),
    }
    upd = jax.jit(
        lambda v, x: model.apply(
            v, x, train=True, mutable=["quant_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
    )
    for b in calib:
        _, new = upd(variables, jnp.asarray(b))
        variables = {**variables, **new}
    our_logits = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.asarray(x_eval)
        )
    )
    print(f"  our SIM pass done in {time.time() - t0:.0f}s")

    # fp32 oracle on the same weights → the quantization noise floor
    from ivit_tpu.models.vit_float import quant_params_to_float

    fmodel = create_model(f"{args.model}_fp32")
    float_logits = np.asarray(
        jax.jit(lambda p, x: fmodel.apply({"params": p}, x, train=False))(
            quant_params_to_float(variables["params"]), jnp.asarray(x_eval)
        )
    )

    _compare_stats(ref_model, variables, _vit_name_map(depth), out)
    _report_logits("ref↔sim", ref_logits, our_logits, float_logits, out)

    # sim ↔ deploy engine at full scale on this artifact
    t0 = time.time()
    artifact = freeze_vit(model, jax.tree.map(np.asarray, variables))
    dep_logits = np.asarray(
        jax.jit(build_vit_infer(artifact, use_pallas=False))(x_eval)
    )
    _check_sim_deploy(dep_logits, our_logits, artifact, out, t0)
    _maybe_bundle(args, out["family"], variables, x_eval, our_logits)
    return out


_SWIN_GEOMETRIES = {
    # our registry name → (reference factory, depths)
    "swin_tiny": ("swin_tiny_patch4_window7_224", (2, 2, 6, 2)),
    "swin_small": ("swin_small_patch4_window7_224", (2, 2, 18, 2)),
    "swin_base": ("swin_base_patch4_window7_224", (2, 2, 18, 2)),
}


def run_swin(args):
    import torch

    from ivit_tpu.deploy.swin_engine import build_swin_infer, freeze_swin
    from ivit_tpu.models import create_model
    from ivit_tpu.models.import_swin import torch_swin_to_params
    from ivit_tpu.models.import_torch import merge_params

    swin_factory, swin_depths = _SWIN_GEOMETRIES[args.swin_model]
    out = {"family": f"{args.swin_model}_224"}
    ref = _ref_models()
    t0 = time.time()
    torch.manual_seed(0)  # reference-init reproducible
    # drop_path_rate=0 on BOTH sides: the reference swin default is 0.1
    # (swin_quant.py:447) and stochastic-depth masks are live during
    # train()-mode calibration; torch and JAX RNGs cannot draw the same
    # masks, so a nonzero rate turns the EMA-stat comparison into noise
    # (measured: 24% worst drift at 0.1 vs <5% tie dust at 0).
    ref_model = getattr(ref.swin_quant, swin_factory)(
        drop_path_rate=0.0
    )
    if args.checkpoint:
        ckpt = torch.load(args.checkpoint, map_location="cpu")
        ref_model.load_state_dict(ckpt.get("model", ckpt), strict=False)
        out["weights"] = args.checkpoint
        out["weights_kind"] = "trained"
    else:
        out["weights"] = "reference-init (trunc_normal; egress blocked)"
        out["weights_kind"] = "init"
    sd = {
        k: v.numpy()
        for k, v in ref_model.state_dict().items()
        if not any(
            t in k
            for t in (
                "min_val", "max_val", "scaling_factor", "_integer",
                "relative_position_index", "attn_mask",
            )
        )
    }

    calib = [
        _images(args.batch, seed=200 + i)
        for i in range(args.calib_batches)
    ]
    x_eval = _images(args.eval_batch, seed=998)

    ref_model.train()
    with torch.no_grad():
        for b in calib:
            ref_model(_nchw(b))
    ref.model_utils.freeze_model(ref_model)
    ref_model.eval()
    with torch.no_grad():
        ref_logits = ref_model(_nchw(x_eval)).numpy()
    print(f"  reference torch pass done in {time.time() - t0:.0f}s")

    t0 = time.time()
    model = create_model(args.swin_model, drop_path_rate=0.0)
    x0 = jnp.zeros((1, 224, 224, 3))
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=True)
    )(jax.random.PRNGKey(0), x0)
    merged = merge_params(
        jax.tree.map(np.asarray, variables["params"]),
        torch_swin_to_params(sd),
    )
    variables = {
        "params": merged,
        "quant_stats": jax.tree.map(
            lambda v: jnp.zeros_like(v), variables["quant_stats"]
        ),
    }
    upd = jax.jit(
        lambda v, x: model.apply(
            v, x, train=True, mutable=["quant_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
    )
    for b in calib:
        _, new = upd(variables, jnp.asarray(b))
        variables = {**variables, **new}
    our_logits = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.asarray(x_eval)
        )
    )
    print(f"  our SIM pass done in {time.time() - t0:.0f}s")

    from ivit_tpu.models.swin_float import swin_quant_params_to_float

    fmodel = create_model(f"{args.swin_model}_fp32")
    float_logits = np.asarray(
        jax.jit(lambda p, x: fmodel.apply({"params": p}, x, train=False))(
            swin_quant_params_to_float(variables["params"]),
            jnp.asarray(x_eval),
        )
    )

    _compare_stats(
        ref_model, variables, _swin_name_map(swin_depths), out
    )
    _report_logits("ref↔sim", ref_logits, our_logits, float_logits, out)

    t0 = time.time()
    artifact = freeze_swin(model, jax.tree.map(np.asarray, variables))
    dep_logits = np.asarray(
        jax.jit(build_swin_infer(artifact, use_pallas=False))(x_eval)
    )
    _check_sim_deploy(dep_logits, our_logits, artifact, out, t0)
    _maybe_bundle(args, out["family"], variables, x_eval, our_logits)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["vit", "swin", "both"],
                    default="both")
    ap.add_argument("--model", choices=sorted(_VIT_GEOMETRIES),
                    default="deit_tiny",
                    help="ViT-family geometry for the vit leg "
                         "(vit_large = the depth-24 zoo corner, "
                         "VERDICT r4 #7; CPU torch leg is slow)")
    ap.add_argument("--swin-model", choices=sorted(_SWIN_GEOMETRIES),
                    default="swin_tiny",
                    help="Swin-family geometry for the swin leg "
                         "(swin_base = the width corner: dim 128, "
                         "heads 4-8-16-32)")
    ap.add_argument("--checkpoint", default=None,
                    help="real pretrained torch checkpoint (networked box)")
    ap.add_argument("--save-bundle", default=None,
                    help="dir to pickle {variables, x_eval, sim logits} "
                         "for scripts/full_scale_tpu_parity.py")
    ap.add_argument("--calib-batches", type=int, default=2)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--eval-batch", type=int, default=8)
    args = ap.parse_args()

    results = []
    if args.family in ("vit", "both"):
        print("== deit_tiny 224² full-scale differential ==")
        results.append(run_vit(args))
    if args.family in ("swin", "both"):
        print(f"== {args.swin_model} 224² full-scale differential ==")
        results.append(run_swin(args))
    import json

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
