"""The reference-checkpoint migration chain, end-to-end at micro scale.

Full-scale converged records live in FULLSCALE_r05.jsonl (both families
100% top-1, engine ≡ ref torch eval per-image on the TPU). This test
pins the CHAIN itself in-suite on CPU: reference torch QAT (1 epoch,
its own freeze_model) → checkpoint.pth.tar → `convert_model
--torch-checkpoint` → int8 engine sweep → margin-decided per-image
agreement (scripts/migrate_ref_checkpoint.py's acceptance rule).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_migration_chain_micro(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [
            sys.executable, "scripts/migrate_ref_checkpoint.py",
            "--family", "deit", "--epochs", "1",
            "--data", str(tmp_path / "data"),
            "--workdir", str(tmp_path / "work"),
            "--train-n", "256", "--test-n", "64",
            "--platform", "cpu",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-4000:]
    assert '"record": "migrate_ref_checkpoint"' in proc.stdout
