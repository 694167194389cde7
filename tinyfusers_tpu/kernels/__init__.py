from . import flash_attention, quant_matmul  # noqa: F401
