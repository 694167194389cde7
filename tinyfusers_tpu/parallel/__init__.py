from . import distributed
from .mesh import DATA_AXIS, MODEL_AXIS, data_sharded, make_mesh, replicated
from .sharding import shard_params, sharding_tree, tp_spec_tree

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "data_sharded", "distributed", "make_mesh",
    "replicated", "shard_params", "sharding_tree", "tp_spec_tree",
]
