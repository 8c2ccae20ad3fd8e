from .mesh import make_mesh, data_sharding, param_shardings, replicated

__all__ = ["make_mesh", "data_sharding", "param_shardings", "replicated"]
