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
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.quant import QTensor, quantize_int8

# params['layers'] keys that are matmul weights (contract over axis -2)
# ("qkv": engine-side quantization runs AFTER fuse_qkv_params for int4,
# so the fused projection is quantized as one weight)
_LAYER_MATMUL_KEYS: Set[str] = {
    "q", "k", "v", "qkv", "o", "mu_to_q", "mu_to_k", "mu_to_v",
}
_MLP_MATMUL_KEYS: Set[str] = {
    "gate", "up", "down", "shared_gate", "shared_up", "shared_down",
    # pre-fused gate_up (fuse_gate_up_params run before quantization) must
    # quantize too — leaving it float silently kept a 503 MB bf16 weight
    # in an "int4" model (caught via the ablation tool's weight_mb readout)
    "gate_up",
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

    from ..ops.quant import Q4Tensor, QTensor

    out = dict(params)
    layers = dict(params["layers"])
    for key in list(layers.keys()):
        if key in _LAYER_MATMUL_KEYS and not isinstance(
            layers[key], (QTensor, Q4Tensor)
        ):
            layers[key] = quant(layers[key])
    mlp = dict(layers["mlp"])
    routed = cfg.use_token_routed_mlp and cfg.num_experts > 1
    for key in list(mlp.keys()):
        if key not in _MLP_MATMUL_KEYS:
            continue
        w = mlp[key]
        if isinstance(w, (QTensor, Q4Tensor)):
            continue  # already quantized (direct-int4 checkpoint load)
        if routed and key in ("gate", "up") and w.ndim == 4:
            # flat-expert layout (L, H, E*I): every MoE matmul becomes one
            # 2D dequant GEMM — the Pallas kernels read int8 straight from
            # HBM instead of XLA materializing a dequantized (E, H, I) copy
            # each step. Per-(e,i) scales are unchanged (contraction is H).
            l, e, h, i = w.shape
            w = jnp.transpose(w, (0, 2, 1, 3)).reshape(l, h, e * i)
        elif routed and key == "down" and w.ndim == 4:
            # (L, E*I, H): the expert sum folds into the contraction; scale
            # granularity moves from per-(e,h) to per-h (validated against
            # the reference fp32 envelope in test_reference_parity)
            l, e, i, h = w.shape
            w = w.reshape(l, e * i, h)
        mlp[key] = quant(w)
    layers["mlp"] = mlp
    out["layers"] = layers
    if "lm_head" in out:
        # lm head stays float: fp32 logits parity (tied embeddings are
        # never quantized in the reference either)
        pass
    return out


def fuse_qkv_params(params):
    """Concatenate q/k/v projections into one (.., H, Hq+2*Hkv) weight —
    one GEMM per layer instead of three (ref: model.py fuse_qkv :114-145).
    Works on float arrays and QTensors (scales concatenate per-out-channel).
    Apply AFTER quantize_params; mu-guided attention keeps separate
    projections (the mu biases add to q/k/v pre-concat order anyway)."""
    from ..ops.quant import Q4Tensor, QTensor

    layers = params.get("layers", {})
    if not all(k in layers for k in ("q", "k", "v")) or "qkv" in layers:
        return params
    q, k, v = layers["q"], layers["k"], layers["v"]
    out = dict(params)
    new_layers = dict(layers)
    if isinstance(q, QTensor):
        fused = QTensor(
            jnp.concatenate([q.q, k.q, v.q], axis=-1),
            jnp.concatenate([q.s, k.s, v.s], axis=-1),
        )
    elif isinstance(q, Q4Tensor):
        # int4: packed/scales/zeros all concatenate on the out-channel axis
        fused = Q4Tensor(
            jnp.concatenate([q.packed, k.packed, v.packed], axis=-1),
            jnp.concatenate([q.scales, k.scales, v.scales], axis=-1),
            jnp.concatenate([q.zeros, k.zeros, v.zeros], axis=-1),
            group_size=q.group_size,
            layout=q.layout,
        )
    else:
        fused = jnp.concatenate([q, k, v], axis=-1)
    new_layers["qkv"] = fused
    for key in ("q", "k", "v"):
        del new_layers[key]
    out["layers"] = new_layers
    return out


def fuse_gate_up_params(params):
    """Concatenate the MLP gate and up projections into one ``gate_up``
    weight of doubled width (ref analog: quantization.py:227-286
    `int8_fused_gate_up_native` — one GEMM for gate+up).

    Under W8A8 both GEMMs share the same quantized activations, so a single
    int8 GEMM over the concatenated columns replaces two kernel launches
    per layer; fused_swiglu splits the (N, 2W) product in-register. Apply
    AFTER quantize_params / fuse_shared_expert_params (flat 2-D layouts
    only); float stacked or int4 layouts are left unfused."""
    from ..ops.quant import QTensor

    layers = params.get("layers", {})
    mlp = layers.get("mlp") if isinstance(layers, dict) else None
    if not mlp or "gate" not in mlp or "gate_up" in mlp:
        return params
    gate, up = mlp["gate"], mlp["up"]

    if isinstance(gate, QTensor) and isinstance(up, QTensor) \
            and gate.q.ndim == 3:
        fused = QTensor(jnp.concatenate([gate.q, up.q], axis=-1),
                        jnp.concatenate([gate.s, up.s], axis=-1))
    elif not isinstance(gate, QTensor) and getattr(gate, "ndim", 0) == 3:
        fused = jnp.concatenate([gate, up], axis=-1)
    else:
        return params

    out = dict(params)
    new_layers = dict(layers)
    new_mlp = dict(mlp)
    new_mlp["gate_up"] = fused
    del new_mlp["gate"], new_mlp["up"]
    new_layers["mlp"] = new_mlp
    out["layers"] = new_layers
    return out


def materialize_lm_head(params, cfg: ModelConfig):
    """Store the tied-embedding logits weight as a transposed copy.

    ``lm_logits`` otherwise computes ``embed.T`` in-graph; inside the
    multistep decode scan XLA re-materializes that 65 MB transpose every
    iteration (measured ~3 ms/iter at B=16 on v5e — half the decode step).
    One (H, V) copy costs +embed-size HBM and removes it entirely."""
    if not cfg.tie_word_embeddings or "lm_head" in params \
            or "lm_head_t" in params:
        return params
    out = dict(params)
    # distinct key: num_parameters/param_bytes must not double-count the
    # tied embedding through its transposed serving copy
    out["lm_head_t"] = jnp.transpose(params["embed"])
    return out


def fuse_shared_expert_params(params, cfg: ModelConfig):
    """Fold the shared lexical expert into the flat-expert MoE layout.

    The reference computes the shared expert as a separate dense SwiGLU and
    mixes it with the routed output (ref: token_routed_mlp.py:164-186).
    Concatenating its gate/up columns (and down rows) onto the flat-expert
    weights makes the whole MoE one gate/up/down GEMM set per layer — the
    routing mask grows an always-on shared segment whose value carries the
    output scale (see ops/moe.py token_routed_mlp fused branch).

    The shared segment is zero-padded to a multiple of 128 columns so the
    fused widths stay lane-aligned (zero gate/up columns produce zero
    intermediates; zero down rows contribute nothing — exact no-ops).

    Quantized down-projections are re-quantized jointly: per-out-channel
    scales cannot distinguish contraction segments, so the routed and shared
    down weights are dequantized, concatenated, and quantized with one scale
    set (same bit width, scale magnitudes comparable — validated against the
    unfused path in tests). int4 (Q4Tensor) weights are left unfused.
    Apply AFTER quantize_params; no-op when there is no shared expert or the
    routed weights are not in a fusable layout.
    """
    from ..ops.quant import Q4Tensor, QTensor, dequantize, quantize_int8

    layers = params.get("layers", {})
    mlp = layers.get("mlp") if isinstance(layers, dict) else None
    if not mlp or "shared_gate" not in mlp:
        return params
    gate, up, down = mlp["gate"], mlp["up"], mlp["down"]
    sg, su, sd = mlp["shared_gate"], mlp["shared_up"], mlp["shared_down"]
    if any(isinstance(w, Q4Tensor) for w in (gate, up, down, sg, su, sd)):
        return params

    ei = cfg.intermediate_size  # E * per-expert I (flat routed width)

    def shared_cols(w):
        return w.q.shape[-1] if isinstance(w, QTensor) else w.shape[-1]

    s_w = shared_cols(sg)
    pad = (-s_w) % 128

    def fuse_in(routed, shared):
        """gate/up: routed (L,H,E*I) or stacked (L,E,H,I); shared (L,H,S)."""
        if isinstance(routed, QTensor):
            if routed.q.ndim != 3:  # stacked quantized (L,E,H,I): not flat
                return None
            q = jnp.concatenate(
                [routed.q, shared.q,
                 jnp.zeros((*routed.q.shape[:-1], pad), routed.q.dtype)],
                axis=-1)
            s = jnp.concatenate(
                [routed.s, shared.s,
                 jnp.ones((*routed.s.shape[:-1], pad), routed.s.dtype)],
                axis=-1)
            return QTensor(q, s)
        if routed.ndim == 4:  # float stacked (L, E, H, I) -> flat (L, H, E*I)
            l, e, h, i = routed.shape
            routed = jnp.transpose(routed, (0, 2, 1, 3)).reshape(l, h, e * i)
        return jnp.concatenate(
            [routed, shared,
             jnp.zeros((*routed.shape[:-1], pad), routed.dtype)], axis=-1)

    def fuse_down(routed, shared):
        """down: routed (L,E*I,H) or stacked (L,E,I,H); shared (L,S,H)."""
        if isinstance(routed, QTensor):
            if routed.q.ndim != 3:
                return None
            rd = dequantize(routed, jnp.float32)  # (L, E*I, H)
            sh = dequantize(shared, jnp.float32)
            z = jnp.zeros((rd.shape[0], pad, rd.shape[-1]), jnp.float32)
            return quantize_int8(jnp.concatenate([rd, sh, z], axis=-2))
        if routed.ndim == 4:  # (L, E, I, H) -> (L, E*I, H)
            l, e, i, h = routed.shape
            routed = routed.reshape(l, e * i, h)
        z = jnp.zeros((routed.shape[0], pad, routed.shape[-1]), routed.dtype)
        return jnp.concatenate([routed, shared, z], axis=-2)

    fg, fu, fd = fuse_in(gate, sg), fuse_in(up, su), fuse_down(down, sd)
    if fg is None or fu is None or fd is None:
        return params
    w = fg.q.shape[-1] if isinstance(fg, QTensor) else fg.shape[-1]
    if (w - ei) <= 0:
        return params

    out = dict(params)
    new_layers = dict(layers)
    new_mlp = dict(mlp)
    new_mlp["gate"], new_mlp["up"], new_mlp["down"] = fg, fu, fd
    for key in ("shared_gate", "shared_up", "shared_down"):
        del new_mlp[key]
    new_layers["mlp"] = new_mlp
    out["layers"] = new_layers
    return out


def has_quantized_leaves(params) -> bool:
    """True if any weight is already a QTensor/Q4Tensor (e.g. a direct
    AWQ/GPTQ int4 checkpoint load) — engine-side quantization skips then."""
    from ..ops.quant import Q4Tensor, QTensor

    found = False

    def check(x):
        nonlocal found
        if isinstance(x, (QTensor, Q4Tensor)):
            found = True
        return x

    jax.tree_util.tree_map(
        check, params,
        is_leaf=lambda x: isinstance(x, (QTensor, Q4Tensor)))
    return found


def repack_int4_serving(params):
    """Convert every Q4Tensor leaf to the TPU serving ("split") pack layout
    so ops/int4_matmul.py's Pallas kernels apply (identical numerics; the
    reference/AWQ "interleaved" layout would need a per-row interleave the
    VPU can't do cheaply). One-time host/XLA repack at engine init."""
    from ..ops.quant import Q4Tensor, repack_int4_split

    return jax.tree_util.tree_map(
        lambda x: repack_int4_split(x) if isinstance(x, Q4Tensor) else x,
        params,
        is_leaf=lambda x: isinstance(x, Q4Tensor),
    )


def param_bytes(params) -> int:
    skip = {id(params["lm_head_t"])} if "lm_head_t" in params else set()
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if id(leaf) in skip:
            continue  # transposed serving copy of the tied embedding
        total += leaf.size * leaf.dtype.itemsize
    return int(total)
