from .mesh import (
    data_sharding,
    make_mesh,
    param_shardings,
    replicated,
    seq_constraint,
    shard_infer,
    zero1_shardings,
)
from .tp_infer import shard_infer_tp, tp_weight_shardings
from .pipeline import (
    from_pp_variables,
    make_pp_mesh,
    make_pp_train_step,
    pipeline_vit_forward,
    pp_shardings,
    pp_tree_shardings,
    stack_blocks,
    to_pp_variables,
    unstack_blocks,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "param_shardings",
    "replicated",
    "seq_constraint",
    "shard_infer",
    "shard_infer_tp",
    "tp_weight_shardings",
    "zero1_shardings",
    "make_pp_mesh",
    "stack_blocks",
    "unstack_blocks",
    "to_pp_variables",
    "from_pp_variables",
    "pp_shardings",
    "pipeline_vit_forward",
    "make_pp_train_step",
    "pp_tree_shardings",
]
