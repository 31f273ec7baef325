from .attention import paged_attention, varlen_self_attention, write_kv
from .linear import linear, linear_f32
from .moe import dense_swiglu_mlp, token_routed_mlp
from .norms import apply_rope, rms_norm, rope_cos_sin
from .quant import QTensor, dequantize, quantize_activations_int8, quantize_int8

__all__ = [
    "paged_attention",
    "varlen_self_attention",
    "write_kv",
    "linear",
    "linear_f32",
    "dense_swiglu_mlp",
    "token_routed_mlp",
    "apply_rope",
    "rms_norm",
    "rope_cos_sin",
    "QTensor",
    "dequantize",
    "quantize_activations_int8",
    "quantize_int8",
]
