"""Run a repo CLI forced onto CPU, in-process.

The ambient environment presets JAX_PLATFORMS to the real TPU relay and
sitecustomize imports jax at interpreter start, so a plain subprocess
`python quant_train.py ...` picks the axon backend even under
JAX_PLATFORMS=cpu. This wrapper applies the documented double override
(env var + jax.config.update) BEFORE handing control to the CLI.

Usage: python scripts/_cpu_cli.py <cli_path> [cli args...]
"""

import os
import runpy
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

cli = sys.argv[1]
sys.argv = sys.argv[1:]
sys.path.insert(0, os.path.dirname(os.path.abspath(cli)) or ".")
runpy.run_path(cli, run_name="__main__")
