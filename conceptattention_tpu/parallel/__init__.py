from conceptattention_tpu.parallel.mesh import make_mesh, MeshAxes
from conceptattention_tpu.parallel.sharding import (
    flux_param_sharding,
    shard_params,
    activation_sharding,
)
from conceptattention_tpu.parallel.fsdp import (
    flux_fsdp_sharding,
    fsdp_sharding,
    fsdp_spec,
    shard_params_fsdp,
)
from conceptattention_tpu.parallel.pipeline import pipeline_apply
from conceptattention_tpu.parallel.moe import (
    init_moe_params,
    moe_mlp,
    moe_mlp_expert_parallel,
)

__all__ = [
    "make_mesh",
    "MeshAxes",
    "flux_param_sharding",
    "shard_params",
    "activation_sharding",
    "flux_fsdp_sharding",
    "fsdp_sharding",
    "fsdp_spec",
    "shard_params_fsdp",
    "pipeline_apply",
    "init_moe_params",
    "moe_mlp",
    "moe_mlp_expert_parallel",
]
