"""Driver entry points: entry() must be jittable (lowering check)."""

import jax
import pytest


@pytest.mark.slow
def test_entry_lowers():
    from __graft_entry__ import entry

    fn, args = entry()
    # lowering validates traceability without paying full compilation
    jax.jit(fn).lower(*args)
