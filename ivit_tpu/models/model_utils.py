"""Model state utilities — the ``freeze_model``/``unfreeze_model``
analogue (/root/reference/models/model_utils.py:5-40).

In the reference, freezing walks the module tree calling ``fix()`` so
QuantAct stops updating its EMA ranges. Here range updating is a pure
function argument — ``model.apply(..., train=False)`` (or
``update_stats=False`` per QuantAct) IS the frozen model — so these
helpers cover the remaining conveniences: choosing the eval parameter
set and inspecting the frozen scale artifact.
"""

from __future__ import annotations

import numpy as np

from ..core.quantizers import symmetric_scale


def eval_variables(state, use_ema: bool = True) -> dict:
    """Variables for frozen-range evaluation; prefers the EMA weights
    when the state carries them (timm ModelEmaV2 analogue,
    /root/reference/quant_train.py:193-200)."""
    params = state.params
    if use_ema and getattr(state, "ema_params", None) is not None:
        params = state.ema_params
    return {"params": params, "quant_stats": state.quant_stats}


def scale_report(variables, bits: int = 8) -> dict:
    """Flatten every EMA range in ``quant_stats`` into
    ``{module_path: (min, max, scale)}`` — the inspectable form of the
    reference's named ``*_scaling_factor`` buffers (the coupling
    contract, SURVEY.md §1)."""
    import jax

    stats = variables["quant_stats"]
    flat = jax.tree_util.tree_flatten_with_path(stats)[0]
    by_mod: dict = {}
    for path, leaf in flat:
        keys = [getattr(e, "key", None) for e in path]
        mod = "/".join(k for k in keys[:-1] if k is not None)
        by_mod.setdefault(mod, {})[keys[-1]] = float(np.asarray(leaf))
    out = {}
    for mod, mm in by_mod.items():
        if "min_val" in mm and "max_val" in mm:
            s = float(
                symmetric_scale(
                    np.float32(mm["min_val"]), np.float32(mm["max_val"]), bits
                )
            )
            out[mod] = (mm["min_val"], mm["max_val"], s)
    return out
