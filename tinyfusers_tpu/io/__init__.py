from . import checkpoints, quantize_tree, safetensors_io, state_map, torch_pickle  # noqa: F401
