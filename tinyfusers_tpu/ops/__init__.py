from .activations import gelu_erf, gelu_tanh, geglu, quick_gelu, sigmoid, silu, swish
from .attention import packed_beneficial, sdpa, sdpa_packed, sdpa_xla
from .conv import conv2d, upsample_nearest_2x
from .embedding import embedding
from .linear import geglu_linear, linear
from .norms import group_norm, layer_norm
from .quant import Int4Tensor, QuantizedTensor, is_quantized, quantize, quantize_int4

__all__ = [
    "gelu_erf", "gelu_tanh", "geglu", "quick_gelu", "sigmoid", "silu", "swish",
    "packed_beneficial", "sdpa", "sdpa_packed", "sdpa_xla",
    "conv2d", "upsample_nearest_2x",
    "embedding",
    "geglu_linear", "linear",
    "group_norm", "layer_norm",
    "Int4Tensor", "QuantizedTensor", "is_quantized", "quantize",
    "quantize_int4",
]
