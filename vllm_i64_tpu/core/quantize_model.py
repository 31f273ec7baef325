"""Whole-model weight quantization pass.

The TPU analog of the reference's load-time quantization dispatch
(ref: core/loader.py:535-651 post-load quant; core/quantization.py:80-91
per-channel symmetric INT8): every matmul weight in the params pytree is
replaced by a ``QTensor`` (int8 payload + per-out-channel fp32 scales).
Embeddings / norms / routing tables / scalar gates stay float or integer —
matching the reference's rule that routing tables stay integer and logits
math stays fp32 (loader.py:57-76).
"""

from __future__ import annotations

from typing import Set

import jax

from ..config import ModelConfig
from ..ops.quant import QTensor, quantize_int8

# params['layers'] keys that are matmul weights (contract over axis -2)
_LAYER_MATMUL_KEYS: Set[str] = {
    "q", "k", "v", "o", "mu_to_q", "mu_to_k", "mu_to_v",
}
_MLP_MATMUL_KEYS: Set[str] = {
    "gate", "up", "down", "shared_gate", "shared_up", "shared_down",
}


def quantize_params(params, cfg: ModelConfig, method: str = "int8"):
    """Return a new params pytree with matmul weights quantized.

    method: "int8" (per-out-channel symmetric, ref quantization.py:80-91),
    "int4" (per-group-128 asymmetric packed, ref :307-421), or "fp8"
    (scaled e4m3, ref core/fp8.py). The embedding (and tied lm head) remain
    float — logits are computed in fp32 regardless (ref model.py:436-439).
    """
    if method in ("none", None, ""):
        return params
    if method == "int8":
        quant = quantize_int8
    elif method == "int4":
        from ..ops.quant import quantize_int4

        def quant(w):
            if w.shape[-2] % 128:
                return quantize_int8(w)  # ungrouped dims fall back to int8
            return quantize_int4(w)
    elif method == "fp8":
        from ..ops.quant import quantize_fp8

        quant = quantize_fp8
    else:
        raise ValueError(f"unsupported quantization method: {method}")

    out = dict(params)
    layers = dict(params["layers"])
    for key in list(layers.keys()):
        if key in _LAYER_MATMUL_KEYS:
            layers[key] = quant(layers[key])
    mlp = dict(layers["mlp"])
    for key in list(mlp.keys()):
        if key in _MLP_MATMUL_KEYS:
            mlp[key] = quant(mlp[key])
    layers["mlp"] = mlp
    out["layers"] = layers
    if "lm_head" in out:
        # lm head stays float: fp32 logits parity (tied embeddings are
        # never quantized in the reference either)
        pass
    return out


def param_bytes(params) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return int(total)
