"""Two-process jax.distributed test of the multi-host input path.

Proves the §5.8 claim with an executed test (round-1 review: the
reference's NCCL bootstrap was never executed by any entry point; here
the jax.distributed + make_array_from_process_local_data path runs for
real): two CPU processes, each with 2 virtual devices, assemble
process-local batches into one global array on a 4-device mesh and run
a jitted global computation whose result every process can verify.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
    + " --xla_force_host_platform_device_count=2"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=proc_id,
)
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.environ["IVIT_REPO"])
from ivit_tpu.parallel import data_sharding, make_mesh

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

mesh = make_mesh()  # (data=4, model=1) over the global devices
dsh = data_sharding(mesh)

# process-local batch: 4 rows per process -> global (8, 16)
local = (
    np.arange(4 * 16, dtype=np.float32).reshape(4, 16) + 1000 * proc_id
)
global_batch = jax.make_array_from_process_local_data(dsh, local)
assert global_batch.shape == (8, 16), global_batch.shape

@jax.jit
def global_sum(x):
    return jnp.sum(x)

got = float(global_sum(global_batch))
want = float(
    np.sum(np.arange(64, dtype=np.float32).reshape(4, 16))  # proc 0
    + np.sum(np.arange(64, dtype=np.float32).reshape(4, 16) + 1000.0)
)
assert got == want, (got, want)
print(f"proc {proc_id}: global sum ok ({got})")
"""


@pytest.mark.slow
def test_two_process_global_batch_assembly(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = "12355"
    env = dict(os.environ)
    env["IVIT_REPO"] = repo
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "global sum ok" in out, out[-2000:]
