"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must run before jax is imported anywhere.
"""

import os
import sys

# Force CPU: the ambient environment presets JAX_PLATFORMS to the real
# TPU tunnel, which must not serve unit tests. sitecustomize imports jax
# at interpreter start, so editing the env var alone is too late — the
# config must be updated on the already-imported module too (safe: the
# backend itself is only initialized at first use).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
