"""Persistent XLA compilation cache for the CLIs.

On this class of setup (remote-compile TPU relay) a cold jit of the
full train step costs ~20 minutes; the persistent cache makes every
subsequent process (resume, eval, convert, serving) reuse the compiled
executable — the practical analogue of the reference's saved TVM
artifacts (its auto-scheduler logs play the same role,
/root/reference/TVM_benchmark/evaluate_latency.py:55-78).

Enabled by every CLI entry point. Override the location with
``IVIT_XLA_CACHE=<dir>``; disable with ``IVIT_XLA_CACHE=off``.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Point jax at a persistent compilation cache directory.

    Returns the directory used, or None when disabled. Safe to call
    before or after backend initialization (the cache is consulted per
    compile, not at backend init).
    """
    loc = os.environ.get("IVIT_XLA_CACHE", "")
    if loc.lower() in ("off", "0", "none", "disable"):
        return None
    if not loc:
        loc = os.path.join(
            os.path.expanduser("~"), ".cache", "ivit_tpu", "xla"
        )
    os.makedirs(loc, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", loc)
    # default min compile time is 1s — keep everything nontrivial
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return loc
