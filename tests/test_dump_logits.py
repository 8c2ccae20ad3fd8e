"""Per-image sim↔engine logits dump (--dump-logits on both CLIs).

The dress rehearsal's aggregate top-1 equality is trivially satisfiable
by an undertrained model (0.000 == 0.000); the per-image dump makes the
claim falsifiable: the int8 engine must reproduce the simulator's
decision on EVERY validation image, with logits within a few head-scale
LSBs. Analogue of the reference's single-image QAT↔TVM check
(/root/reference/TVM_benchmark/evaluate_accuracy.py) widened to the
whole sweep.
"""

import pickle

import numpy as np
import pytest


@pytest.mark.slow
def test_dump_logits_roundtrip(tmp_path):
    import convert_model
    import evaluate_accuracy
    import quant_train

    base = [
        "--model", "deit_tiny", "--data-set", "SYNTHETIC",
        "--nb-classes", "10", "--input-size", "32",
        "--batch-size", "16", "--lr", "1e-4",
        "--output-dir", str(tmp_path), "--num-workers", "1",
    ]
    quant_train.main(base + ["--epochs", "1", "--max-steps-per-epoch", "2"])

    ckpt = str(tmp_path / "checkpoint.pkl")
    sim_npz = str(tmp_path / "sim.npz")
    quant_train.main(
        base + ["--epochs", "1", "--eval", "--resume", ckpt,
                "--dump-logits", sim_npz]
    )

    art = str(tmp_path / "artifact.pkl")
    convert_model.main(
        ["--model", "deit_tiny", "--checkpoint", ckpt, "--output", art,
         "--nb-classes", "10", "--input-size", "32"]
    )

    eng_npz = str(tmp_path / "eng.npz")
    evaluate_accuracy.main(
        ["--model", "deit_tiny", "--artifact", art,
         "--data-set", "SYNTHETIC", "--input-size", "32",
         "--nb-classes", "10", "--batch-size", "32",
         "--num-workers", "1", "--dump-logits", eng_npz]
    )

    sim = np.load(sim_npz)
    eng = np.load(eng_npz)
    # different eval batch sizes (16 vs 32) must not matter: val order
    # is sequential in both CLIs
    assert sim["logits"].shape == eng["logits"].shape == (128, 10)
    np.testing.assert_array_equal(sim["labels"], eng["labels"])

    # The decision-level claim — the engine reproduces the simulator's
    # prediction on EVERY image — must hold outright:
    np.testing.assert_array_equal(
        sim["logits"].argmax(-1), eng["logits"].argmax(-1)
    )
    # Logit-level: nearly all images match to a few head-scale LSBs.
    # A universal LSB bound is NOT available from a float simulator:
    # the sim's f32-HIGHEST dots round in a reduction order that
    # depends on the jit context and batch shape, so an input whose
    # pre-round value lands on an exact .5 tie can flip 1 carrier LSB
    # early and amplify downstream (measured here: synthetic image 111
    # flips one tie under jit and lands 0.008 ≈ 870 head-LSBs off,
    # argmax unchanged; the eager sim matches the engine bit-exactly
    # on the same input). The integer engine itself is order-exact —
    # dedicated parity tests pin sim↔engine on shared jit programs.
    with open(art, "rb") as f:
        head_scale = float(np.max(pickle.load(f)["head"]["out_scale"]))
    row_err = np.abs(eng["logits"] - sim["logits"]).max(axis=1)
    frac_exact = float((row_err <= 3 * head_scale).mean())
    # how many images hit a tie depends on exactly where the calibrated
    # scales land: 0.96 under the old init-seeded stats, 0.93 after the
    # sentinel-clean calibration change — both the same dust class, and
    # the argmax equality above is the invariant that must be outright.
    assert frac_exact >= 0.88, (frac_exact, row_err.max())
    assert row_err.max() <= 0.05, row_err.max()
