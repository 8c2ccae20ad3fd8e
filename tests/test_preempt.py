"""Graceful preemption (SURVEY §5.3 failure recovery).

Preemptible TPU pools deliver SIGTERM ahead of eviction. The trainer
must catch it, finish the in-flight step, write the rolling checkpoint
mid-epoch, and exit cleanly so ``--resume`` restarts the interrupted
epoch. The reference has no recovery story at all — its every-epoch
save is commented out (/root/reference/quant_train.py:256-261), so a
preempted run loses everything since the last accuracy improvement.

The signal is raised deterministically from inside the step loop (via a
patched MetricLogger.log) rather than from a timer thread — no timing
flake on a loaded core.
"""

import signal

import pytest

from ivit_tpu.utils.checkpoint import load_checkpoint_raw


@pytest.mark.slow
def test_sigterm_saves_and_resume_completes(tmp_path, monkeypatch):
    import quant_train
    import ivit_tpu.utils.metrics as metrics_mod

    base = [
        "--model", "deit_tiny", "--data-set", "SYNTHETIC",
        "--nb-classes", "10", "--input-size", "32",
        "--batch-size", "16", "--lr", "1e-4",
        "--output-dir", str(tmp_path), "--num-workers", "0",
        "--epochs", "2", "--max-steps-per-epoch", "4",
    ]

    orig_log = metrics_mod.MetricLogger.log
    calls = {"n": 0}

    def log_then_preempt(self, i):
        calls["n"] += 1
        if calls["n"] == 6:  # epoch 1, step index 1 (4 steps/epoch)
            signal.raise_signal(signal.SIGTERM)
        return orig_log(self, i)

    monkeypatch.setattr(metrics_mod.MetricLogger, "log", log_then_preempt)
    quant_train.main(list(base))
    monkeypatch.setattr(metrics_mod.MetricLogger, "log", orig_log)

    # the run was cut mid-epoch-1: the rolling checkpoint must record
    # the preemption and point resume back at epoch 1
    ckpt = tmp_path / "checkpoint.pkl"
    assert ckpt.exists()
    _, extra = load_checkpoint_raw(str(ckpt))
    assert extra["preempted_step"] == 1, extra
    assert extra["epoch"] == 0, extra  # resume restarts epoch 1

    # the trainer restored the default SIGTERM disposition on exit
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL

    # resume completes the remaining epoch and leaves a clean final
    # checkpoint (no preemption marker)
    quant_train.main(list(base) + ["--resume", str(ckpt)])
    _, extra2 = load_checkpoint_raw(str(ckpt))
    assert extra2["epoch"] == 1, extra2
    assert "preempted_step" not in extra2, extra2
