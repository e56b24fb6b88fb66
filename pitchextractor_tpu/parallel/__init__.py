from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch
from .sharding import infer_param_shardings, place_params

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "infer_param_shardings",
    "place_params",
]
