"""Deterministic token-routed MoE — the core layer of the vllm-i64 models.

Reference semantics (ref: vllm_i64/layers/token_routed_mlp.py):
  routes[k, n]  = topk_token_to_expert[k, clamp(token_id[n])]   (:113-130)
  out           = w0 * E(routes[0]) + sum_k ((1-w0)/(K-1)) * E(routes[k])  (:154-163)
  shared expert = dense SwiGLU over all tokens, combined via trained output
                  scales or learnable gates (:164-186)

TPU-native design — *masked dense*, not gather/scatter:
Each expert is ``intermediate_size / num_experts`` wide, so computing ALL
experts for ALL tokens costs exactly the FLOPs of one dense MLP of the full
intermediate size. Routing then degenerates to a per-token expert mask folded
into the intermediate activations — top-k mixing weights fold into the same
mask, so the entire top-k MoE is ONE dense SwiGLU pass with a (N, E) weight
mask. No sort, no ragged dispatch, no all-to-all; batched-matmul einsums map
straight onto the MXU, and the E axis shards cleanly for expert parallelism
(each device computes its local experts for all tokens + psum — the
TP-on-intermediate scheme of ref token_routed_mlp.py:62-74).

This replaces the reference's CUDA router/dispatch stack
(csrc/i64_router.cu, csrc/i64_expert_dispatch.cu, kernels/fused_experts.py)
with pure MXU math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .quant import QTensor


def _acc_dtype(dtype):
    """fp32 accumulation, but never downcast (f64 tests stay f64)."""
    return jnp.promote_types(dtype, jnp.float32)


def _maybe_dequant_q4(w, dtype):
    from .quant import Q4Tensor, dequantize_int4

    if isinstance(w, Q4Tensor):
        return dequantize_int4(w, dtype=dtype)
    return w


def _is_flat_expert(w) -> bool:
    """Quantized flat layout: payload is 2D (H, E*I) after layer slicing."""
    from .quant import Q4Tensor, QTensor

    if isinstance(w, QTensor):
        return w.q.ndim == 2
    if isinstance(w, Q4Tensor):
        return w.packed.ndim == 2
    return False


def _expert_einsum_in(x: jax.Array, w) -> jax.Array:
    """x: (N, H), w: (E, H, I) -> (N, E, I) with per-(e,i) dequant."""
    acc_t = _acc_dtype(x.dtype)
    w = _maybe_dequant_q4(w, x.dtype)
    if isinstance(w, QTensor):
        acc = jnp.einsum(
            "nh,ehi->nei", x, w.q.astype(x.dtype), preferred_element_type=acc_t
        )
        return (acc * w.s.astype(acc_t)[None]).astype(x.dtype)
    return jnp.einsum("nh,ehi->nei", x, w, preferred_element_type=x.dtype)


def _expert_einsum_out(inter: jax.Array, w) -> jax.Array:
    """inter: (N, E, I), w: (E, I, H) -> (N, H), summing experts.

    With quantized w the per-(e,h) scales must apply before the expert sum,
    so the e-axis reduction is deferred to after the scale multiply.
    """
    acc_t = _acc_dtype(inter.dtype)
    w = _maybe_dequant_q4(w, inter.dtype)
    if isinstance(w, QTensor):
        acc = jnp.einsum(
            "nei,eih->neh",
            inter,
            w.q.astype(inter.dtype),
            preferred_element_type=acc_t,
        )
        return jnp.sum(acc * w.s.astype(acc_t)[None], axis=1).astype(inter.dtype)
    return jnp.einsum("nei,eih->nh", inter, w, preferred_element_type=inter.dtype)


def compute_routes(
    topk_table: jax.Array,  # (K, vocab) int32 — loaded from checkpoint, bit-exact
    token_ids: jax.Array,  # (N,) int
    vocab_size: int,
) -> jax.Array:
    """(K, N) expert ids. Matches ref token_routed_mlp.py:113-130 including
    the clamp of out-of-range ids."""
    clamped = jnp.clip(token_ids, 0, vocab_size - 1)
    return jnp.take(topk_table, clamped, axis=1)


def route_mask(
    routes: jax.Array,  # (K, N) int32
    num_experts: int,
    primary_weight: float,
    dtype=jnp.float32,
) -> jax.Array:
    """(N, E) combined routing-weight mask.

    mask[n, e] = sum_k w_k * [routes[k, n] == e], with w_0 = primary and
    w_{k>0} = (1 - primary) / (K - 1). Duplicate routes to the same expert
    accumulate, matching the reference's additive mixing (:156-163).
    """
    k = routes.shape[0]
    onehot = jax.nn.one_hot(routes, num_experts, dtype=dtype)  # (K, N, E)
    if k == 1:
        return onehot[0]
    secondary = (1.0 - primary_weight) / (k - 1)
    weights = jnp.concatenate(
        [
            jnp.array([primary_weight], dtype=dtype),
            jnp.full((k - 1,), secondary, dtype=dtype),
        ]
    )
    return jnp.einsum("k,kne->ne", weights, onehot)


def token_routed_mlp(
    x: jax.Array,  # (N, H)
    token_ids: jax.Array,  # (N,)
    *,
    gate_w,  # (E, H, I) float or QTensor
    up_w,  # (E, H, I)
    down_w,  # (E, I, H)
    topk_table: jax.Array,  # (K, vocab)
    num_experts: int,
    vocab_size: int,
    primary_weight: float,
    routed_output_scale: float = 1.0,
    shared_gate=None,  # (H, S) — shared lexical expert
    shared_up=None,
    shared_down=None,  # (S, H)
    shared_output_scale: float = 1.0,
    shared_output_gate: Optional[jax.Array] = None,  # learnable scalars
    routed_output_gate: Optional[jax.Array] = None,
    shared_fused_cols: int = 0,  # >0: shared expert folded into gate/up/down
    routes: Optional[jax.Array] = None,  # (K, N) precomputed expert routes
) -> jax.Array:
    """Full token-routed MLP: routed experts + shared expert + output mixing.

    ``routes`` lets the caller hoist the route-table gather out of a layer
    scan (one gather over the stacked tables instead of a per-layer table
    slice inside the loop); when absent it is computed here."""
    from .linear import linear

    acc_t = _acc_dtype(x.dtype)
    if routes is None:
        routes = compute_routes(topk_table, token_ids, vocab_size)
    mask = route_mask(routes, num_experts, primary_weight, dtype=acc_t)  # (N, E)

    if shared_fused_cols:
        # Shared expert folded in as an always-on trailing segment
        # (core/quantize_model.fuse_shared_expert_params): ONE gate/up
        # SwiGLU and ONE down GEMM cover routed + shared. Output mixing
        # (ref token_routed_mlp.py:164-186) folds into the mask — routed
        # columns carry routing_weight * routed_scale, shared columns carry
        # shared_scale; zero-padded columns are exact no-ops.
        from .fused_swiglu import fused_swiglu

        if shared_output_gate is not None and routed_output_gate is not None:
            r_scale = routed_output_gate.astype(acc_t)
            s_scale = shared_output_gate.astype(acc_t)
        else:
            r_scale = jnp.asarray(routed_output_scale, acc_t)
            s_scale = jnp.asarray(shared_output_scale, acc_t)
        from .dequant_matmul import w8a8_enabled
        from .fused_swiglu import fused_swiglu_quant, fused_swiglu_quant_eligible

        n_rows = x.shape[0]
        if isinstance(gate_w, type(None)):
            w_flat = 0
        else:
            w_flat = (gate_w.q.shape[-1] if hasattr(gate_w, "q")
                      else gate_w.shape[-1])
        if (up_w is None and w8a8_enabled()
                and fused_swiglu_quant_eligible(
                    x, gate_w, n_rows, w_flat, x.shape[-1])):
            # decode fast path: SwiGLU + mask + per-row int8 quantize run in
            # the gate_up GEMM's epilogue (ops/fused_swiglu.fused_swiglu_quant)
            # — bit-identical to the unfused chain below
            i_size = (w_flat // 2 - shared_fused_cols) // num_experts
            mask_flat = jnp.repeat(
                (mask * r_scale).astype(jnp.float32), i_size, axis=1)
            shared_seg = jnp.broadcast_to(
                s_scale.astype(jnp.float32), (n_rows, shared_fused_cols))
            mask_all = jnp.concatenate([mask_flat, shared_seg], axis=1)
            import os

            interp = os.environ.get("VLLM_I64_TPU_PALLAS_INTERPRET") == "1"
            pq = fused_swiglu_quant(x, gate_w, mask_all, interpret=interp)
            return linear(pq, down_w)
        inter = fused_swiglu(x, gate_w, up_w)  # (N, E*I + shared_fused_cols)
        i_size = (inter.shape[-1] - shared_fused_cols) // num_experts
        mask_flat = jnp.repeat(mask * r_scale, i_size, axis=1)
        shared_seg = jnp.broadcast_to(
            s_scale, (x.shape[0], shared_fused_cols)
        ).astype(acc_t)
        mask_all = jnp.concatenate([mask_flat, shared_seg], axis=1)
        inter = (inter.astype(acc_t) * mask_all).astype(x.dtype)
        return linear(inter, down_w)

    if _is_flat_expert(gate_w):
        # quantized flat-expert layout (H, E*I): one fused Pallas SwiGLU
        # dequant GEMM computes ALL experts' intermediates, the routing
        # mask expands per expert segment, and down is one dequant GEMM
        # whose contraction performs the expert sum
        from .fused_swiglu import fused_swiglu
        from .linear import linear

        inter = fused_swiglu(x, gate_w, up_w)  # (N, E*I)
        i_size = inter.shape[-1] // num_experts
        mask_flat = jnp.repeat(mask, i_size, axis=1).astype(acc_t)
        inter = (inter.astype(acc_t) * mask_flat).astype(x.dtype)
        routed = linear(inter, down_w)  # (N, H)
    else:
        gate = _expert_einsum_in(x, gate_w)  # (N, E, I)
        up = _expert_einsum_in(x, up_w)
        inter = jax.nn.silu(gate.astype(acc_t)) * up.astype(acc_t)
        inter = (inter * mask[:, :, None]).astype(x.dtype)
        routed = _expert_einsum_out(inter, down_w)  # (N, H)

    if shared_gate is None:
        return routed_output_scale * routed

    from .fused_swiglu import fused_swiglu

    shared = linear(fused_swiglu(x, shared_gate, shared_up), shared_down)
    if shared_output_gate is not None and routed_output_gate is not None:
        # Learnable scalar gates (ref :174-178)
        return (
            shared_output_gate.astype(x.dtype) * shared
            + routed_output_gate.astype(x.dtype) * routed
        )
    return routed_output_scale * routed + shared_output_scale * shared


def dense_swiglu_mlp(x: jax.Array, gate_w, up_w, down_w) -> jax.Array:
    """Dense SwiGLU (ref: complexity_deep/model.py:243-255). The gate+up
    GEMMs and SiLU·mul run in one fused Pallas kernel on TPU int8."""
    from .fused_swiglu import fused_swiglu
    from .linear import linear

    return linear(fused_swiglu(x, gate_w, up_w), down_w)
