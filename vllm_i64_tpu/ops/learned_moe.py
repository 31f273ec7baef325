"""Learned-gate sparse MoE (Mixtral-style) + integer-routing variant.

Reference semantics (ref: vllm_i64/layers/moe.py:133-233 MixtralMoE,
IntegerMoE): softmax router -> top-k expert selection -> renormalized
weights -> weighted expert-output sum. ``integer_mode`` swaps in the Q16
LUT softmax; IntegerMoE routes by ``token_id % num_experts`` with uniform
weights.

TPU-native dispatch — same masked-dense scheme as the deterministic
token-routed layer (ops/moe.py): all experts compute for all tokens (each
expert is intermediate/E wide, so total FLOPs equal one dense MLP) and the
router's top-k weights fold into a (N, E) mask on the intermediate
activations. No sort, no per-expert GEMM loop, no scatter — the reference's
sorted-dispatch Python loop (:201-226) is the semantic spec only.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .integer import softmax_integer
from .moe import _acc_dtype, _expert_einsum_in, _expert_einsum_out


def learned_gate_routing(
    x: jax.Array,  # (N, H)
    gate_w,  # (H, E)
    top_k: int,
    integer_mode: bool = False,
):
    """Router: softmax(x @ gate) -> top-k (weights renormalized).
    Returns (weights (N, K), indices (N, K) int32)."""
    from .linear import linear

    logits = linear(x, gate_w).astype(jnp.float32)
    probs = (softmax_integer(logits) if integer_mode
             else jax.nn.softmax(logits, axis=-1))
    top_w, top_i = jax.lax.top_k(probs, top_k)
    top_w = top_w / jnp.maximum(
        jnp.sum(top_w, axis=-1, keepdims=True), 1e-9)
    return top_w, top_i.astype(jnp.int32)


def modulo_routing(token_ids: jax.Array, num_experts: int, top_k: int = 1):
    """IntegerMoE routing: expert = (token_id + k) % E, uniform weights
    (ref: moe.py IntegerMoE)."""
    n = token_ids.shape[0]
    idx = jnp.stack(
        [(token_ids + k) % num_experts for k in range(top_k)], axis=-1
    ).astype(jnp.int32)
    w = jnp.full((n, top_k), 1.0 / top_k, jnp.float32)
    return w, idx


def learned_moe(
    x: jax.Array,  # (N, H)
    *,
    gate_w,  # (H, E) router — or None with token_ids for IntegerMoE
    expert_gate_w,  # (E, H, I)
    expert_up_w,  # (E, H, I)
    expert_down_w,  # (E, I, H)
    top_k: int = 2,
    integer_mode: bool = False,
    token_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Sparse-MoE forward with masked-dense dispatch."""
    num_experts = (expert_gate_w.q.shape[0]
                   if hasattr(expert_gate_w, "q") else expert_gate_w.shape[0])
    if gate_w is None:
        if token_ids is None:
            raise ValueError("IntegerMoE needs token_ids")
        top_w, top_i = modulo_routing(token_ids, num_experts, top_k)
    else:
        top_w, top_i = learned_gate_routing(x, gate_w, top_k, integer_mode)

    acc_t = _acc_dtype(x.dtype)
    # (N, E) mask: weight where expert selected, 0 elsewhere; duplicate
    # selections accumulate (matches additive mixing)
    onehot = jax.nn.one_hot(top_i, num_experts, dtype=acc_t)  # (N, K, E)
    mask = jnp.einsum("nk,nke->ne", top_w.astype(acc_t), onehot)

    gate = _expert_einsum_in(x, expert_gate_w)  # (N, E, I)
    up = _expert_einsum_in(x, expert_up_w)
    inter = jax.nn.silu(gate.astype(acc_t)) * up.astype(acc_t)
    inter = (inter * mask[:, :, None]).astype(x.dtype)
    return _expert_einsum_out(inter, expert_down_w)
