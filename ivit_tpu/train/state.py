"""Training state: params + quantization state + optimizer + EMA.

The quantization EMA ranges (``quant_stats``) are first-class saved
state, preserving the reference's "every scale is a named, serializable
artifact" contract (SURVEY.md §1 coupling contract;
/root/reference/models/quantization_utils/quant_modules.py:50-53,135).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    quant_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Optional[Any] = None

    def variables(self):
        return {"params": self.params, "quant_stats": self.quant_stats}


def create_train_state(
    model,
    rng,
    sample_input,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.0,
) -> TrainState:
    # train=False: variables (incl. zero-valued quant_stats) are still
    # created, but NO EMA update runs on the dummy sample. Seeding the
    # stats from a zeros batch through init weights polluted the first
    # ~20 real calibration batches at 0.95^k — the reference's fresh
    # model instead starts from the min==max sentinel and assigns the
    # first real batch directly (quant_modules.py:177-187; pinned by
    # tests/test_ref_model_differential.py, which exposed this).
    # jit: eager init dispatches hundreds of ops one-by-one, which is
    # pathological over a remote-TPU relay (~minutes for a 12-block
    # model); under jit it is one compile + one execution, and PRNG
    # determinism makes the values identical either way.
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False)
    )(rng, sample_input)
    params = variables["params"]
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        # float reference models have no quantization state
        quant_stats=variables.get("quant_stats", {}),
        opt_state=tx.init(params),
        # jnp.copy: EMA must not alias the live params (aliased buffers
        # break donation in jitted steps).
        ema_params=jax.tree.map(jax.numpy.copy, params) if ema_decay > 0 else None,
        tx=tx,
    )
