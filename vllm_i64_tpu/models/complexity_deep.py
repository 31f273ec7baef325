"""ComplexityDeep model family (tr-hash-moe-500m / tr-moe-306 / dense-306).

Pure-functional JAX re-design of the reference model
(ref: vllm_i64/models/complexity_deep/model.py):
- decoder-only transformer, GQA attention + rotate-half RoPE + optional
  QK-RMSNorm (model.py:74-201)
- token-routed MoE or dense SwiGLU MLP (model.py:310-343)
- optional Mu-Guidance: a learnable equilibrium vector threaded between
  layers, clamped to [-2, 2], biasing Q/K/V (model.py:58-67, 167-170, 421-432)
- tied embeddings -> fp32 logits (model.py:436-439)

TPU-first decisions:
- parameters are stacked over the layer axis and the layer stack runs under
  ``jax.lax.scan`` — one traced layer body, O(1) compile time in depth.
- shapes are (B, T, ...) padded/bucketed; T=1 is the decode program. There is
  no per-sequence Python loop anywhere (the reference's per-seq KV loop at
  model.py:203-236 is the semantic spec only).
- the KV cache is a functional paged array threaded through the scan.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.attention import (
    paged_attention,
    paged_attention_window,
    varlen_self_attention,
    write_kv,
)
from ..ops.linear import linear, linear_f32
from ..ops.moe import dense_swiglu_mlp, token_routed_mlp
from ..ops.norms import apply_rope, rms_norm, rope_cos_sin

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def cyclic_route_table(vocab_size: int, num_experts: int, top_k: int) -> np.ndarray:
    """Default modulo-cyclic routing table: route k of token t is
    (t + k) % E (ref: token_routed_mlp.py:92-107). TR-HASH checkpoints
    overwrite this with their exact balanced-hash tables at load time."""
    ids = np.arange(vocab_size, dtype=np.int32)
    return np.stack([(ids + k) % num_experts for k in range(max(1, top_k))])


def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random-init parameters with the exact pytree layout the loader fills.

    Weight convention: (in_features, out_features) so forward is x @ w
    (torch Linear stores the transpose; the loader handles it).
    """
    L = cfg.num_hidden_layers
    H = cfg.hidden_size
    d = cfg.head_dim
    Hq = cfg.num_attention_heads * d
    Hkv = cfg.num_key_value_heads * d
    E = cfg.num_experts
    I = cfg.expert_intermediate_size
    S = cfg.resolved_shared_intermediate_size
    K = cfg.effective_top_k

    keys = iter(jax.random.split(key, 64))

    def w(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dtype)

    layers: Params = {
        "input_ln": jnp.ones((L, H), dtype),
        "q": w((L, H, Hq)),
        "k": w((L, H, Hkv)),
        "v": w((L, H, Hkv)),
        "o": w((L, Hq, H)),
        "post_ln": jnp.ones((L, H), dtype),
    }
    if cfg.use_qk_norm:
        layers["q_norm"] = jnp.ones((L, d), dtype)
        layers["k_norm"] = jnp.ones((L, d), dtype)
    if cfg.mu_enabled:
        layers["mu_to_q"] = w((L, H, Hq))
        layers["mu_to_k"] = w((L, H, Hkv))
        layers["mu_to_v"] = w((L, H, Hkv))
        layers["mu"] = jnp.ones((L, H), dtype)
        layers["mu_proj"] = jnp.zeros((L, H, H), dtype)

    if cfg.use_token_routed_mlp and E > 1:
        mlp: Params = {
            "gate": w((L, E, H, I)),
            "up": w((L, E, H, I)),
            "down": w((L, E, I, H)),
            "route_table": jnp.asarray(
                np.broadcast_to(
                    cyclic_route_table(cfg.vocab_size, E, K), (L, K, cfg.vocab_size)
                ).copy()
            ),
        }
        if cfg.shared_expert:
            mlp["shared_gate"] = w((L, H, S))
            mlp["shared_up"] = w((L, H, S))
            mlp["shared_down"] = w((L, S, H))
            if cfg.use_shared_routed_gates:
                mlp["shared_gate_scalar"] = jnp.full((L,), cfg.shared_gate_init, dtype)
                mlp["routed_gate_scalar"] = jnp.full((L,), cfg.routed_gate_init, dtype)
        layers["mlp"] = mlp
    elif cfg.learned_moe_enabled:
        # Mixtral-style learned-gate MoE (ref: layers/moe.py:133-233):
        # expert stacks + a small (H, E) router; no route table
        layers["mlp"] = {
            "gate": w((L, E, H, I)),
            "up": w((L, E, H, I)),
            "down": w((L, E, I, H)),
            "router": w((L, H, E)),
        }
    else:
        layers["mlp"] = {
            "gate": w((L, H, cfg.intermediate_size)),
            "up": w((L, H, cfg.intermediate_size)),
            "down": w((L, cfg.intermediate_size, H)),
        }

    params: Params = {
        "embed": w((cfg.vocab_size, H)),
        "final_norm": jnp.ones((H,), dtype),
        "layers": layers,
    }
    if cfg.mu_enabled:
        params["mu_init"] = jnp.zeros((H,), dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w((H, cfg.vocab_size))
    return params


# ---------------------------------------------------------------------------
# Layer body
# ---------------------------------------------------------------------------


def _attention_block(
    p: Params,
    cfg: ModelConfig,
    hidden: jax.Array,  # (B, T, H)
    positions: jax.Array,  # (B, T)
    mu_prev: Optional[jax.Array],
    kv_layer: Optional[Tuple[jax.Array, jax.Array]],
    block_tables: Optional[jax.Array],
    ctx_lens: Optional[jax.Array],
    seq_lens: Optional[jax.Array],
    valid: Optional[jax.Array],
    window_ctx=None,  # (win_k_l, win_v_l, k_idx, ctx0) — deferred-KV decode
    block_aligned_write: bool = False,
):
    b, t, _ = hidden.shape
    d = cfg.head_dim
    hq = cfg.num_attention_heads
    hkv = cfg.num_key_value_heads

    if "qkv" in p:
        # fused projection: one GEMM instead of three (ref: model.py
        # fuse_qkv :114-145 — the CPU inference fusion, equally valuable on
        # TPU where small decode GEMMs are launch-latency-bound)
        qkv = linear(hidden, p["qkv"])
        q = qkv[..., : hq * d]
        k = qkv[..., hq * d : hq * d + hkv * d]
        v = qkv[..., hq * d + hkv * d :]
    else:
        q = linear(hidden, p["q"])
        k = linear(hidden, p["k"])
        v = linear(hidden, p["v"])
    if cfg.mu_enabled and mu_prev is not None:
        q = q + linear(mu_prev, p["mu_to_q"])
        k = k + linear(mu_prev, p["mu_to_k"])
        v = v + linear(mu_prev, p["mu_to_v"])

    q = q.reshape(b, t, hq, d)
    k = k.reshape(b, t, hkv, d)
    v = v.reshape(b, t, hkv, d)

    if cfg.use_qk_norm:
        q = rms_norm(q, p["q_norm"], 1e-6)
        k = rms_norm(k, p["k_norm"], 1e-6)

    cos, sin = rope_cos_sin(positions, d, cfg.rope_theta)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_kv = None
    if kv_layer is not None and window_ctx is not None:
        # Deferred-KV decode (T=1): the cache is read-only this window; the
        # current token's K/V lands in the window side buffer and attends
        # in-band (ops/attention.paged_attention_window). The per-layer
        # scatter->gather chain this replaces was ~60% of a decode
        # iteration on v5e; the cache merge happens once per window.
        win_k_l, win_v_l, k_idx, ctx0, layer_idx = window_ctx
        k_cache, v_cache = kv_layer
        bt = block_tables
        if layer_idx is not None:
            # stacked read-only cache closed over the layer scan: gather
            # with layer-flattened block ids instead of letting scan
            # dynamic-slice a full per-layer cache copy out of the stack
            # (2 x 16.8 MB HBM copy per layer per iteration measured in
            # the r5 decode trace — 27% of the whole iteration)
            nl, nb = k_cache.shape[0], k_cache.shape[1]
            k_cache = k_cache.reshape(nl * nb, *k_cache.shape[2:])
            v_cache = v_cache.reshape(nl * nb, *v_cache.shape[2:])
            bt = block_tables + layer_idx * nb
        # window side buffers are FLAT (B, K, Hkv*d) like the cache pages
        zero = jnp.zeros((), k_idx.dtype)
        idx = (zero, k_idx, zero)
        win_k_l = jax.lax.dynamic_update_slice(
            win_k_l, k.reshape(b, t, hkv * d).astype(win_k_l.dtype), idx)
        win_v_l = jax.lax.dynamic_update_slice(
            win_v_l, v.reshape(b, t, hkv * d).astype(win_v_l.dtype), idx)
        out = paged_attention_window(
            q, k_cache, v_cache, bt, ctx0, win_k_l, win_v_l, k_idx,
            integer_softmax=cfg.use_integer_attention,
        )
        new_kv = (win_k_l, win_v_l)
    elif kv_layer is not None:
        k_cache, v_cache = kv_layer
        k_cache, v_cache = write_kv(
            k_cache, v_cache, k, v, block_tables, positions, valid,
            block_aligned=block_aligned_write,
        )
        out = paged_attention(
            q, k_cache, v_cache, block_tables, positions, ctx_lens,
            sliding_window=cfg.sliding_window,
            integer_softmax=cfg.use_integer_attention,
        )
        new_kv = (k_cache, v_cache)
    else:
        out = varlen_self_attention(
            q, k, v, seq_lens, sliding_window=cfg.sliding_window,
            integer_softmax=cfg.use_integer_attention,
        )

    out = out.reshape(b, t, hq * d)
    return linear(out, p["o"]), new_kv


def _norm_maybe_quant(hidden: jax.Array, w: jax.Array, eps: float, consumer):
    """rms_norm — fused with per-row int8 activation quant when the
    consuming GEMM is an int8 W8A8 matmul and EngineConfig.fused_norm_quant
    is on (ref: kernels/triton/I64_fused_rmsnorm_quant.py — norm + quant in
    one kernel emitting (int8, scale) straight into the int8 GEMM).

    Returns a float array, or a PreQuantActs marker the W8A8 GEMMs consume
    without re-quantizing (numerics identical either way: the fused kernel
    replicates quantize_activations_int8's scale math exactly)."""
    from ..ops.dequant_matmul import fused_norm_quant_enabled, w8a8_enabled
    from ..ops.quant import (
        PreQuantActs,
        Q4Tensor,
        QTensor,
        quantize_activations_int8,
    )

    int8_consumer = (
        isinstance(consumer, QTensor)
        and consumer.q.ndim == 2
        and consumer.q.dtype == jnp.int8
    )
    # int4 split-layout weights consume (int8, scale) rows the same way —
    # the W4A8 kernel's int8 MXU dot (ops/int4_matmul._mm_w4a8_kernel)
    int4_consumer = (
        isinstance(consumer, Q4Tensor)
        and consumer.packed.ndim == 2
        and consumer.layout == "split"
    )
    fuse = (
        fused_norm_quant_enabled()
        and w8a8_enabled()
        and (int8_consumer or int4_consumer)
    )
    if not fuse:
        return rms_norm(hidden, w, eps)
    b, t, h = hidden.shape
    x2 = hidden.reshape(b * t, h)
    from ..ops.attention import _interpret_kernels

    interpret = _interpret_kernels()
    if (interpret or jax.default_backend() not in ("cpu",)) \
            and (b * t) % 8 == 0 and h % 128 == 0:
        from ..ops.attention import _mesh_and_tp
        from ..ops.fused_norm import rmsnorm_quant_pallas

        mesh, _ = _mesh_and_tp()
        if mesh is None:
            q, s = rmsnorm_quant_pallas(x2, w, eps, interpret=interpret)
        else:
            # activations are replicated between layers under tp/ep (psum
            # after o/down restores full rows), so the kernel runs
            # replicated on every device inside shard_map — the Pallas call
            # is opaque to GSPMD and needs the manual-axes context
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            q, s = shard_map(
                lambda a, b_: rmsnorm_quant_pallas(
                    a, b_, eps, interpret=interpret),
                mesh=mesh,
                in_specs=(P(), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )(x2, w)
    else:
        q, s = quantize_activations_int8(rms_norm(x2, w, eps))
    return PreQuantActs(q, s, (b, t, h), hidden.dtype)


def _flat_mlp_width(w) -> int:
    """Trailing width of a per-layer mlp weight in flat layout, else 0."""
    from ..ops.quant import QTensor

    if isinstance(w, QTensor):
        return w.q.shape[-1] if w.q.ndim == 2 else 0
    return w.shape[-1] if getattr(w, "ndim", 0) == 2 else 0


def _ep_mlp_block(mp: Params, cfg: ModelConfig, x: jax.Array,
                  token_ids: jax.Array, valid=None):
    """Token-routed MLP with expert-parallel dispatch
    (ModelConfig.moe_backend == "ep_a2a"; ops/ep_dispatch.ep_routed_experts).
    The routed experts run capacity-bounded on their owning devices and
    combine via psum; the shared expert and output scales are dense/local,
    composed here exactly as in ops/moe.token_routed_mlp's tail
    (ref: token_routed_mlp.py:164-186)."""
    from ..ops.ep_dispatch import ep_routed_experts
    from ..ops.fused_swiglu import fused_swiglu
    from ..ops.linear import linear

    routed = ep_routed_experts(
        x,
        token_ids.reshape(-1),
        gate_w=mp["gate"],
        up_w=mp["up"],
        down_w=mp["down"],
        topk_table=mp["route_table"],
        num_experts=cfg.num_experts,
        vocab_size=cfg.vocab_size,
        primary_weight=cfg.primary_weight,
        capacity_factor=cfg.ep_capacity_factor,
        valid=None if valid is None else valid.reshape(-1),
    )
    if mp.get("shared_gate") is None:
        return cfg.routed_output_scale * routed
    shared = linear(
        fused_swiglu(x, mp["shared_gate"], mp["shared_up"]), mp["shared_down"]
    )
    if (mp.get("shared_gate_scalar") is not None
            and mp.get("routed_gate_scalar") is not None):
        return (
            mp["shared_gate_scalar"].astype(x.dtype) * shared
            + mp["routed_gate_scalar"].astype(x.dtype) * routed
        )
    return (cfg.routed_output_scale * routed
            + cfg.shared_output_scale * shared)


def _mlp_block(p: Params, cfg: ModelConfig, hidden: jax.Array,
               token_ids: jax.Array, valid=None, routes=None):
    b, t, h = hidden.shape
    x = hidden.reshape(b * t, h)
    mp = p["mlp"]
    # gate+up concatenated into one weight (fuse_gate_up_params): the
    # swiglu entry splits it; up_w=None signals the combined layout
    gate_w = mp.get("gate_up", mp.get("gate"))
    up_w = None if "gate_up" in mp else mp.get("up")
    if cfg.use_token_routed_mlp and cfg.num_experts > 1:
        if cfg.moe_backend == "ep_a2a":
            return _ep_mlp_block(mp, cfg, x, token_ids, valid).reshape(b, t, h)
        # shared expert folded into the flat gate/up/down weights
        # (core/quantize_model.fuse_shared_expert_params): detected by the
        # extra trailing columns beyond the routed E*I width
        fused_cols = 0
        if cfg.shared_expert and "shared_gate" not in mp:
            w_cols = _flat_mlp_width(gate_w)
            if "gate_up" in mp:
                w_cols //= 2
            if w_cols > cfg.intermediate_size:
                fused_cols = w_cols - cfg.intermediate_size
        out = token_routed_mlp(
            x,
            token_ids.reshape(-1),
            gate_w=gate_w,
            up_w=up_w,
            down_w=mp["down"],
            topk_table=mp["route_table"],
            routes=routes,
            num_experts=cfg.num_experts,
            vocab_size=cfg.vocab_size,
            primary_weight=cfg.primary_weight,
            routed_output_scale=cfg.routed_output_scale,
            shared_gate=mp.get("shared_gate"),
            shared_up=mp.get("shared_up"),
            shared_down=mp.get("shared_down"),
            shared_output_scale=cfg.shared_output_scale,
            shared_output_gate=mp.get("shared_gate_scalar"),
            routed_output_gate=mp.get("routed_gate_scalar"),
            shared_fused_cols=fused_cols,
        )
    elif cfg.learned_moe_enabled:
        from ..ops.learned_moe import learned_moe

        out = learned_moe(
            x,
            gate_w=mp["router"],
            expert_gate_w=mp["gate"],
            expert_up_w=mp["up"],
            expert_down_w=mp["down"],
            top_k=cfg.effective_top_k,
            integer_mode=cfg.routing_strategy == "learned_gate_integer",
        )
    else:
        out = dense_swiglu_mlp(x, gate_w, up_w, mp["down"])
    return out.reshape(b, t, h)


def _layer_fn(
    cfg: ModelConfig,
    carry,
    layer_in,
    token_ids,
    positions,
    block_tables,
    ctx_lens,
    seq_lens,
    valid,
    window_meta=None,  # (k_idx, ctx0) for deferred-KV decode
    block_aligned_write: bool = False,
    stacked_kv=None,  # (k, v) full (L, NB, bs, Hkv, d) read-only stack
    routes=None,  # (K, N) precomputed expert routes for this layer
):
    hidden, mu_prev = carry
    window_ctx = None
    if stacked_kv is not None:
        # deferred-KV decode, cache closed over the scan: layer_in carries
        # (params, win_k, win_v, layer_idx); the body gathers straight from
        # the stacked cache with layer-flattened block ids
        p, wk, wv, layer_idx = layer_in
        kv_layer = stacked_kv
        k_idx, ctx0 = window_meta
        window_ctx = (wk, wv, k_idx, ctx0, layer_idx)
    elif len(layer_in) == 5:
        # deferred-KV decode: per-layer caches (read-only) + window buffers
        p, kc, vc, wk, wv = layer_in
        kv_layer = (kc, vc)
        k_idx, ctx0 = window_meta
        window_ctx = (wk, wv, k_idx, ctx0, None)
    elif len(layer_in) == 3:
        p, kc, vc = layer_in
        kv_layer = (kc, vc)
    else:
        (p,) = layer_in
        kv_layer = None

    res = hidden
    h = _norm_maybe_quant(hidden, p["input_ln"], cfg.rms_norm_eps,
                          p.get("qkv", p.get("q")))
    attn_out, new_kv = _attention_block(
        p, cfg, h, positions, mu_prev, kv_layer, block_tables, ctx_lens,
        seq_lens, valid, window_ctx=window_ctx,
        block_aligned_write=block_aligned_write,
    )
    hidden = res + attn_out

    res = hidden
    mp = p["mlp"]
    h = _norm_maybe_quant(hidden, p["post_ln"], cfg.rms_norm_eps,
                          mp.get("gate_up", mp.get("gate")))
    hidden = res + _mlp_block(p, cfg, h, token_ids, valid, routes=routes)

    mu_next = mu_prev
    if cfg.mu_enabled:
        # mu = clamp(mu_param, 0, 2) + mu_proj(h); threaded clamp to [-2, 2]
        # (ref: model.py:58-67, 431-432)
        mu_cur = jnp.clip(p["mu"], 0.0, 2.0)[None, None, :] + linear(
            hidden, p["mu_proj"]
        )
        mu_next = jnp.clip(mu_cur, -2.0, 2.0)

    out_carry = (hidden, mu_next)
    if kv_layer is not None:
        return out_carry, new_kv
    return out_carry, None


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------


def forward_layers(
    layer_params: Params,  # stacked (L_stage, ...) slice of params["layers"]
    cfg: ModelConfig,
    hidden: jax.Array,  # (B, T, H)
    mu_prev: Optional[jax.Array],
    token_ids: jax.Array,  # (B, T) int32 (clipped) — drives MoE routing
    positions: jax.Array,
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    block_tables: Optional[jax.Array] = None,
    ctx_lens: Optional[jax.Array] = None,
    seq_lens: Optional[jax.Array] = None,
    valid: Optional[jax.Array] = None,
    window: Optional[tuple] = None,  # (win_k, win_v, k_idx, ctx0) deferred-KV
    block_aligned_write: bool = False,
):
    """Run a contiguous range of decoder layers under lax.scan.

    The pipeline-parallel unit: a stage's hidden (+ mu) state is exactly
    what crosses stage boundaries (the reference's IntermediateTensors
    {hidden_states, mu_prev}, parallel/pp_utils.py).
    Returns (hidden, mu, new_kv_for_these_layers). In deferred-KV decode
    mode (``window`` set) the caches are read-only and the third return is
    the updated (win_k, win_v) buffers instead."""
    carry = (hidden, mu_prev)

    window_meta = None
    if window is not None:
        win_k, win_v, k_idx, ctx0 = window
        window_meta = (k_idx, ctx0)

    # Hoist MoE routing out of the layer scan: ONE gather over the stacked
    # (L, K, vocab) route tables replaces a per-layer dynamic-slice of the
    # full (K, vocab) table inside the loop (a 22.6 us strided HBM copy per
    # layer per iteration in the r5 decode trace — 0.68 ms/iter at 30L).
    routes_all = None
    mp0 = layer_params.get("mlp") if hasattr(layer_params, "get") else None
    if (
        cfg.use_token_routed_mlp
        and cfg.num_experts > 1
        and cfg.moe_backend != "ep_a2a"
        and isinstance(mp0, dict)
        and mp0.get("route_table") is not None
    ):
        ids_flat = jnp.clip(
            token_ids.reshape(-1), 0, cfg.vocab_size - 1
        ).astype(jnp.int32)
        routes_all = jnp.take(
            mp0["route_table"], ids_flat, axis=2
        )  # (L, K, N)

    def body(carry, layer_in, stacked_kv=None):
        if routes_all is not None:
            *layer_in, routes = layer_in
            layer_in = tuple(layer_in)
        else:
            routes = None
        return _layer_fn(
            cfg, carry, layer_in, token_ids, positions, block_tables,
            ctx_lens, seq_lens, valid, window_meta=window_meta,
            block_aligned_write=block_aligned_write,
            stacked_kv=stacked_kv, routes=routes,
        )

    def with_routes(xs):
        return xs + (routes_all,) if routes_all is not None else xs

    if kv is not None and window is not None:
        # decode window: the paged cache is READ-ONLY — close it over the
        # scan and index by layer inside the body (no per-layer slice copy)
        nl = win_k.shape[0]
        li = jnp.arange(nl, dtype=jnp.int32)
        xs = with_routes((layer_params, win_k, win_v, li))
        (hidden, mu), new_wins = jax.lax.scan(
            lambda c, x: body(c, x, stacked_kv=(kv[0], kv[1])), carry, xs)
        new_kv = (new_wins[0], new_wins[1])
    elif kv is not None:
        xs = with_routes((layer_params, kv[0], kv[1]))
        (hidden, mu), new_caches = jax.lax.scan(body, carry, xs)
        new_kv = (new_caches[0], new_caches[1])
    else:
        xs = with_routes((layer_params,))
        (hidden, mu), _ = jax.lax.scan(body, carry, xs)
        new_kv = None
    return hidden, mu, new_kv


def embed_tokens(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,
    soft_embeds: Optional[jax.Array] = None,  # (B, T, H)
    soft_mask: Optional[jax.Array] = None,  # (B, T) bool
):
    """Embedding lookup + initial mu. Returns (hidden, mu_prev, clipped_ids).

    VLM soft-token fusion: positions where ``soft_mask`` is set take their
    hidden state from ``soft_embeds`` (vision-projector output) instead of
    the embedding table; their token id (the image placeholder) still drives
    deterministic MoE routing (ref analog: i64_engine.py:1129-1151)."""
    ids = jnp.clip(token_ids, 0, cfg.vocab_size - 1).astype(jnp.int32)
    hidden = jnp.take(params["embed"], ids, axis=0)
    if soft_embeds is not None:
        hidden = jnp.where(
            soft_mask[..., None], soft_embeds.astype(hidden.dtype), hidden
        )
    mu_prev = None
    if cfg.mu_enabled:
        mu_prev = jnp.broadcast_to(
            params["mu_init"][None, None, :], hidden.shape
        ).astype(hidden.dtype)
    return hidden, mu_prev, ids


def forward_hidden(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,  # (B, T) int32
    positions: jax.Array,  # (B, T) int32
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,  # (L, NB, bs, Hkv, d) x2
    block_tables: Optional[jax.Array] = None,  # (B, MB)
    ctx_lens: Optional[jax.Array] = None,  # (B,)
    seq_lens: Optional[jax.Array] = None,  # (B,) for cache-free mode
    valid: Optional[jax.Array] = None,  # (B, T) bool
    soft_embeds: Optional[jax.Array] = None,  # (B, T, H) VLM soft tokens
    soft_mask: Optional[jax.Array] = None,  # (B, T) bool
    block_aligned_write: bool = False,
):
    """Run embedding + all decoder layers. Returns (hidden(B,T,H), new_kv)."""
    hidden, mu_prev, ids = embed_tokens(
        params, cfg, token_ids, soft_embeds=soft_embeds, soft_mask=soft_mask
    )
    hidden, _, new_kv = forward_layers(
        params["layers"], cfg, hidden, mu_prev, ids, positions,
        kv=kv, block_tables=block_tables, ctx_lens=ctx_lens,
        seq_lens=seq_lens, valid=valid,
        block_aligned_write=block_aligned_write,
    )
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    return hidden, new_kv


def lm_logits(params: Params, cfg: ModelConfig, hidden: jax.Array) -> jax.Array:
    """fp32 logits from final hidden states (ref: model.py:436-439).

    A materialized ``lm_head`` is preferred even for tied embeddings: the
    in-graph ``embed.T`` costs a 65 MB transpose that XLA re-materializes
    per decode iteration inside the multistep scan (measured ~3 ms/iter at
    B=16 on v5e — HALF the decode step). Engine init stores the transposed
    copy once (+65 MB HBM); the math is identical."""
    w = params.get("lm_head_t", params.get("lm_head"))
    if w is None:
        w = params["embed"].T  # tied, untransposed (tests/parity paths)
    return linear_f32(hidden, w)


def forward(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,
    positions: Optional[jax.Array] = None,
    seq_lens: Optional[jax.Array] = None,
    **kv_kwargs,
) -> jax.Array:
    """Standalone full-logits forward (parity tests / simple generation).

    token_ids: (B, T). Returns fp32 logits (B, T, vocab).
    """
    b, t = token_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    if seq_lens is None:
        seq_lens = jnp.full((b,), t, jnp.int32)
    hidden, _ = forward_hidden(
        params, cfg, token_ids, positions, seq_lens=seq_lens, **kv_kwargs
    )
    return lm_logits(params, cfg, hidden)


def forward_step(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,  # (B, T)
    positions: jax.Array,  # (B, T)
    kv: Tuple[jax.Array, jax.Array],
    block_tables: jax.Array,  # (B, MB)
    ctx_lens: jax.Array,  # (B,)
    last_idx: jax.Array,  # (B,) index of last valid token per row
    valid: jax.Array,  # (B, T) bool
    soft_embeds: Optional[jax.Array] = None,  # (B, T, H) VLM soft tokens
    soft_mask: Optional[jax.Array] = None,  # (B, T) bool
    block_aligned_write: bool = False,
):
    """Engine step: paged-cache forward returning last-token fp32 logits.

    Only the gathered last-token hidden states hit the (H, V) lm head —
    prefill never materializes (B, T, V) logits.
    """
    hidden, new_kv = forward_hidden(
        params, cfg, token_ids, positions,
        kv=kv, block_tables=block_tables, ctx_lens=ctx_lens, valid=valid,
        soft_embeds=soft_embeds, soft_mask=soft_mask,
        block_aligned_write=block_aligned_write,
    )
    last_h = jnp.take_along_axis(hidden, last_idx[:, None, None].astype(jnp.int32), axis=1)
    logits = lm_logits(params, cfg, last_h[:, 0, :])  # (B, V) fp32
    return logits, new_kv


def forward_step_window(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,  # (B, 1)
    positions: jax.Array,  # (B, 1)
    kv: Tuple[jax.Array, jax.Array],  # READ-ONLY this window
    block_tables: jax.Array,  # (B, MB)
    ctx0: jax.Array,  # (B,) cache-resident tokens at window start
    win_k: jax.Array,  # (L, B, K, Hkv, d) window KV side buffers
    win_v: jax.Array,
    k_idx: jax.Array,  # scalar i32 iteration within the window
):
    """One deferred-KV decode iteration: like forward_step for T=1, but the
    paged cache is not written — each layer appends its K/V to the window
    side buffers and attends to cache history + the window in-band. The
    caller merges the window into the cache once per multistep window
    (ops/attention.merge_window_kv), removing the per-layer scatter->gather
    serialization that dominated decode on v5e.

    Returns (logits(B, V) fp32, win_k, win_v)."""
    hidden, mu_prev, ids = embed_tokens(params, cfg, token_ids)
    hidden, _, new_win = forward_layers(
        params["layers"], cfg, hidden, mu_prev, ids, positions,
        kv=kv, block_tables=block_tables,
        window=(win_k, win_v, k_idx, ctx0),
    )
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    logits = lm_logits(params, cfg, hidden[:, 0, :])
    return logits, new_win[0], new_win[1]


def num_parameters(params: Params) -> int:
    # lm_head_t is a transposed serving copy of the tied embedding
    # (core/quantize_model.materialize_lm_head) — not extra parameters
    counted = {k: v for k, v in params.items() if k != "lm_head_t"}
    leaves = jax.tree_util.tree_leaves(counted)
    return int(sum(np.prod(l.shape) for l in leaves))
