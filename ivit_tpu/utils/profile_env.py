"""Shared IVIT_PROFILE_* env parsing for the profiling/bench scripts.

The profiling scripts (scripts/bench_variants.py, scripts/profile_engine.py,
scripts/check_tpu_parity.py) select the model's recorded spec modes
(softmax_bits, gelu_stable — see quant_train.py's flags of the same
names) through environment variables so one driver invocation can sweep
configs. One parser lives here so adding the NEXT recorded model mode
cannot silently reach only some of the scripts — a missed copy would
make one script build a different spec than the others while claiming
the same config.
"""

from __future__ import annotations

import os


def profile_model_kwargs(is_swin: bool = False) -> dict:
    """Model kwargs selected by IVIT_PROFILE_SM_BITS / _GELU_STABLE.

    ``is_swin``: Swin's probability precision is fixed at 8 by spec
    (models/swin.py hardcodes IntSoftmax(out_bits=8)), so the
    softmax-bits override only applies to ViT-family models.
    """
    kwargs: dict = {}
    if not is_swin and os.environ.get("IVIT_PROFILE_SM_BITS"):
        kwargs["softmax_bits"] = int(os.environ["IVIT_PROFILE_SM_BITS"])
    if os.environ.get("IVIT_PROFILE_GELU_STABLE"):
        kwargs["gelu_stable"] = True
    return kwargs
