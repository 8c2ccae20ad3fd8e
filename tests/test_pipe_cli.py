"""--pipe N in the trainer CLI (VERDICT r4 #6).

The pipeline library (parallel/pipeline.py) is reachable from
quant_train.py: a (data, pipe) mesh GPipe finetune with mixup targets,
EMA, metrics, and checkpointing — the documented subset being
frozen-range semantics (hence the --calib-batches/--resume guard), a
deterministic step graph, and a fresh optimizer state.
"""

import numpy as np
import pytest

from ivit_tpu.utils.checkpoint import load_checkpoint_raw


BASE = [
    "--model", "deit_tiny", "--data-set", "SYNTHETIC",
    "--nb-classes", "10", "--input-size", "32",
    "--batch-size", "16", "--lr", "1e-4",
    "--num-workers", "0", "--drop-path", "0.0",
]


class TestPipeGuards:
    def test_swin_rejected(self, tmp_path):
        import quant_train

        with pytest.raises(SystemExit, match="ViT family"):
            quant_train.main(BASE + [
                "--model", "swin_tiny", "--window-size", "4",
                "--pipe", "2", "--calib-batches", "1",
                "--output-dir", str(tmp_path),
            ])

    def test_exclusive_with_mesh_model(self, tmp_path):
        import quant_train

        with pytest.raises(SystemExit, match="exclusive"):
            quant_train.main(BASE + [
                "--pipe", "2", "--mesh-model", "2",
                "--calib-batches", "1", "--output-dir", str(tmp_path),
            ])

    def test_requires_calibrated_ranges(self, tmp_path):
        import quant_train

        with pytest.raises(SystemExit, match="frozen-range"):
            quant_train.main(BASE + [
                "--pipe", "2", "--output-dir", str(tmp_path),
                "--epochs", "1",
            ])

    def test_depth_divisibility(self, tmp_path):
        import quant_train

        with pytest.raises(SystemExit, match="depth"):
            quant_train.main(BASE + [
                "--pipe", "5", "--calib-batches", "1",
                "--output-dir", str(tmp_path), "--epochs", "1",
            ])


@pytest.mark.slow
def test_pipe_e2e_synthetic(tmp_path):
    """Full CLI run under --pipe 2 on the 8-device CPU mesh: calibrate,
    train one epoch pipelined, validate, checkpoint — then the written
    checkpoint loads back through the standard (non-pipe) path."""
    import quant_train

    acc = quant_train.main(BASE + [
        "--pipe", "2", "--calib-batches", "1",
        "--epochs", "1", "--max-steps-per-epoch", "2",
        "--output-dir", str(tmp_path),
    ])
    assert np.isfinite(acc)

    raw, extra = load_checkpoint_raw(str(tmp_path / "checkpoint.pkl"))
    assert extra["pipe"] == 2
    assert extra["epoch"] == 0
    # the stacked layout was unstacked before saving: per-block keys
    assert "blocks_0" in raw["params"] and "blocks_11" in raw["params"]

    # interop: the pipelined run's checkpoint evaluates through the
    # standard path (same spec metadata, same pytree layout)
    acc2 = quant_train.main(BASE + [
        "--eval", "--resume", str(tmp_path / "checkpoint.pkl"),
        "--output-dir", str(tmp_path),
    ])
    assert np.isfinite(acc2)

    # and resumes INTO another pipelined run (--resume satisfies the
    # frozen-range guard; restacking happens after the load)
    acc3 = quant_train.main(BASE + [
        "--pipe", "2", "--resume", str(tmp_path / "checkpoint.pkl"),
        "--epochs", "2", "--max-steps-per-epoch", "2",
        "--output-dir", str(tmp_path),
    ])
    assert np.isfinite(acc3)
    _, extra2 = load_checkpoint_raw(str(tmp_path / "checkpoint.pkl"))
    assert extra2["epoch"] == 1 and extra2["pipe"] == 2
