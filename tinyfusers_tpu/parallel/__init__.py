from . import distributed
from .mesh import DATA_AXIS, MODEL_AXIS, data_sharded, make_mesh, replicated
from .pipeline import PIPE_AXIS, pipeline_apply, pipeline_scan
from .sharding import (fsdp_spec_tree, shard_fsdp, shard_params,
                       sharding_tree, tp_spec_tree)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "PIPE_AXIS", "data_sharded", "distributed",
    "make_mesh", "pipeline_apply", "pipeline_scan", "replicated",
    "fsdp_spec_tree", "shard_fsdp", "shard_params",
    "sharding_tree", "tp_spec_tree",
]
