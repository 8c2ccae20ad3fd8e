"""convert_model resolves spec metadata recorded in the checkpoint.

quant_train records the spec-level model properties the scales were
trained under (model name, softmax_bits, gelu_stable, input_size,
nb_classes, window_size) in every checkpoint; convert_model must (a)
default to them when the flags are omitted, (b) refuse a conflicting
flag loudly — a silent mismatch at freeze time degrades accuracy with
no error — and (c) keep working on pre-metadata checkpoints.

Analogue of the reference converter's implicit contract: its
convert_model.py hard-assumes the checkpoint matches the CLI-chosen
architecture (/root/reference/TVM_benchmark/convert_model.py:24-40).
"""

import jax
import numpy as np
import pytest

import convert_model
from ivit_tpu.utils import load_artifact, save_checkpoint


def _fake_ckpt(tmp_path, extra):
    # the conflict checks fire BEFORE the model is built or frozen, so
    # the state payload never gets read — a dummy pytree suffices
    path = str(tmp_path / "ckpt.pkl")
    save_checkpoint(path, {"params": {}, "quant_stats": {}}, extra)
    return path


META = {
    "model": "deit_tiny",
    "input_size": 32,
    "nb_classes": 10,
    "softmax_bits": 8,
    "gelu_stable": True,
}


class TestConflicts:
    def test_model_conflict(self, tmp_path):
        ckpt = _fake_ckpt(tmp_path, META)
        with pytest.raises(SystemExit, match="deit_tiny"):
            convert_model.main(["--checkpoint", ckpt,
                                "--model", "deit_small"])

    def test_softmax_bits_conflict(self, tmp_path):
        ckpt = _fake_ckpt(tmp_path, META)
        with pytest.raises(SystemExit, match="softmax-bits"):
            convert_model.main(["--checkpoint", ckpt,
                                "--softmax-bits", "16"])

    def test_geometry_conflict(self, tmp_path):
        ckpt = _fake_ckpt(tmp_path, META)
        with pytest.raises(SystemExit, match="input-size"):
            convert_model.main(["--checkpoint", ckpt,
                                "--input-size", "224"])

    def test_window_size_conflict(self, tmp_path):
        ckpt = _fake_ckpt(
            tmp_path,
            {"model": "swin_tiny", "window_size": 4, "input_size": 32,
             "nb_classes": 10},
        )
        with pytest.raises(SystemExit, match="window-size"):
            convert_model.main(["--checkpoint", ckpt,
                                "--window-size", "7"])

    def test_legacy_swin_softmax16_record_tolerated(self, tmp_path):
        """Swin checkpoints written before the metadata fix recorded the
        (ignored) ViT flag default softmax_bits=16, not the model's true
        8-bit spec — convert_model must accept --softmax-bits 8 on them
        (mirrors quant_train.check_resume_spec's skip)."""
        ckpt = _fake_ckpt(
            tmp_path,
            {"model": "swin_tiny", "window_size": 4, "input_size": 32,
             "nb_classes": 10, "softmax_bits": 16},
        )
        # past the spec checks → the dummy params fail at freeze
        with pytest.raises((KeyError, TypeError, AttributeError)):
            convert_model.main(["--checkpoint", ckpt,
                                "--softmax-bits", "8",
                                "--window-size", "4"])

    def test_matching_flags_pass_resolution(self, tmp_path):
        # same values as recorded → resolution succeeds; the dummy
        # params then fail at freeze, proving we got past the checks
        ckpt = _fake_ckpt(tmp_path, META)
        with pytest.raises((KeyError, TypeError, AttributeError)):
            convert_model.main(
                ["--checkpoint", ckpt, "--model", "deit_tiny",
                 "--input-size", "32", "--nb-classes", "10",
                 "--softmax-bits", "8", "--gelu-stable"]
            )


@pytest.mark.slow
def test_metadata_resolution_end_to_end(tmp_path):
    """A checkpoint trained under non-default spec converts with NO
    flags, and the artifact reproduces the recorded spec exactly."""
    from ivit_tpu.models import create_model

    model = create_model(
        "deit_tiny", num_classes=10, img_size=32,
        softmax_bits=8, gelu_stable=True,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    variables = jax.jit(lambda r, im: model.init(r, im, train=False))(
        jax.random.PRNGKey(1), x
    )
    ckpt = str(tmp_path / "trained.pkl")
    save_checkpoint(
        ckpt, jax.tree.map(np.asarray, variables), dict(META, epoch=0)
    )

    out = str(tmp_path / "artifact.pkl")
    convert_model.main(["--checkpoint", ckpt, "--output", out])

    cfg = load_artifact(out)["config"]
    assert cfg["img_size"] == 32
    assert cfg["num_classes"] == 10
    assert cfg["softmax_bits"] == 8
    assert cfg["gelu_stable"] is True


@pytest.mark.slow
def test_pre_metadata_checkpoint_defaults(tmp_path):
    """Checkpoints predating the metadata (extra carries no spec keys)
    still convert under the explicit flags, exactly as before."""
    from ivit_tpu.models import create_model

    model = create_model("deit_tiny", num_classes=10, img_size=32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    variables = jax.jit(lambda r, im: model.init(r, im, train=False))(
        jax.random.PRNGKey(1), x
    )
    ckpt = str(tmp_path / "old.pkl")
    save_checkpoint(
        ckpt, jax.tree.map(np.asarray, variables),
        {"epoch": 3, "best_acc1": 1.0},  # pre-metadata extra
    )

    out = str(tmp_path / "artifact.pkl")
    convert_model.main(
        ["--checkpoint", ckpt, "--output", out, "--model", "deit_tiny",
         "--input-size", "32", "--nb-classes", "10"]
    )

    cfg = load_artifact(out)["config"]
    assert cfg["img_size"] == 32
    assert cfg["softmax_bits"] == 16
    assert cfg["gelu_stable"] is False
