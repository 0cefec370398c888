from conceptattention_tpu.parallel.mesh import make_mesh, MeshAxes
from conceptattention_tpu.parallel.sharding import (
    flux_param_sharding,
    shard_params,
    activation_sharding,
)

__all__ = [
    "make_mesh",
    "MeshAxes",
    "flux_param_sharding",
    "shard_params",
    "activation_sharding",
]
