from .mesh import create_mesh, batch_sharding, replicate
from .sharding import tensor_parallel_rules, infer_param_sharding, shard_params

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicate",
    "tensor_parallel_rules",
    "infer_param_sharding",
    "shard_params",
]
