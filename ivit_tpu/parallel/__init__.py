from .mesh import (
    data_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_infer,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "param_shardings",
    "replicated",
    "shard_infer",
]
