"""Expert-parallel all-to-all dispatch for many-expert token-routed MoE.

Reference semantics (ref: vllm_i64/layers/token_routed_i64/layer.py:229-299):
experts are partitioned across EP ranks; tokens are sorted by destination
rank, exchanged with ``all_to_all``, run through the local experts, and
exchanged back (unsorted) with top-k mixing applied at combine time.

TPU-native design: the default MoE path in this framework is *masked dense*
(ops/moe.py) — for the production models (E=4) computing every expert costs
exactly one dense MLP and needs zero communication beyond the weight psum.
All-to-all dispatch wins when E is large and top-k small: compute drops from
``E/K``x the routed FLOPs to exactly the routed FLOPs, at the price of two
``jax.lax.all_to_all`` exchanges over ICI.

Shape discipline (SPMD, fixed capacity):
- every device holds the SAME N tokens and computes the SAME deterministic
  routes (the route table is replicated and integer — ref layer.py:80-96);
- each of the K*N (route, token) pairs has destination device
  ``expert // E_local``; pairs beyond the per-destination capacity
  ``C = ceil(K*N/D * capacity_factor)`` are dropped (balanced hash tables
  make overflow vanishingly rare; capacity is a static shape, as XLA
  requires);
- exchange is dense ``(D, C, H)`` — the "ragged" counts ride in a validity
  mask, which is what a fixed-shape SPMD program on TPU wants.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .moe import compute_routes, _acc_dtype


def _mix_weights(k: int, primary_weight: float, dtype) -> jax.Array:
    """(K,) top-k mixing weights: w0 = primary, rest split (1-w0)/(K-1)
    (ref: token_routed_mlp.py:154-163)."""
    if k == 1:
        return jnp.ones((1,), dtype)
    secondary = (1.0 - primary_weight) / (k - 1)
    return jnp.concatenate([
        jnp.array([primary_weight], dtype),
        jnp.full((k - 1,), secondary, dtype),
    ])


def ep_all_to_all_routed_experts(
    x: jax.Array,  # (N, H) tokens, REPLICATED over the ep axis
    token_ids: jax.Array,  # (N,)
    *,
    gate_w: jax.Array,  # (E_local, H, I) — this device's expert shard
    up_w: jax.Array,
    down_w: jax.Array,  # (E_local, I, H)
    topk_table: jax.Array,  # (K, vocab) replicated, bit-exact
    num_experts: int,
    vocab_size: int,
    primary_weight: float,
    capacity_factor: float = 1.5,
    axis_name: str = "ep",
) -> jax.Array:
    """Routed-expert output (N, H) via all-to-all dispatch.

    Must run inside ``shard_map`` (or an equivalent manual-axis context)
    over ``axis_name``. Returns only the ROUTED expert sum — the shared
    expert and output scales compose outside (they are dense and local).
    """
    d = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    e_local = num_experts // d
    n, h = x.shape
    acc_t = _acc_dtype(x.dtype)

    routes = compute_routes(topk_table, token_ids, vocab_size)  # (K, N)
    k = routes.shape[0]
    mix = _mix_weights(k, primary_weight, acc_t)  # (K,)

    # -- build per-destination send buffers (identical math on all devices) --
    p = k * n
    flat_e = routes.reshape(p)  # pair p = k*N + n (k-major)
    flat_tok = jnp.tile(jnp.arange(n, dtype=jnp.int32), k)
    flat_w = jnp.repeat(mix, n)  # (P,)
    dest = flat_e // e_local  # (P,)

    cap = max(1, int(-(-p // d) * capacity_factor))
    onehot = (dest[:, None] == jnp.arange(d, dtype=dest.dtype)[None]).astype(
        jnp.int32
    )  # (P, D)
    pos = jnp.take_along_axis(
        jnp.cumsum(onehot, axis=0) - 1, dest[:, None].astype(jnp.int32), axis=1
    )[:, 0]  # rank of pair among its destination's pairs
    keep = pos < cap

    # slot p lands at send[dest[p], pos[p]]; dropped (over-capacity) pairs
    # get the out-of-range sentinel d*cap so mode="drop" discards them —
    # index p is always a LIVE slot (d*cap >= P) and would mis-dispatch the
    # pair to the wrong device/expert
    flat_slot = jnp.where(
        keep, dest.astype(jnp.int32) * cap + pos, jnp.int32(d * cap))
    inv = jnp.full((d * cap,), -1, jnp.int32).at[flat_slot].set(
        jnp.arange(p, dtype=jnp.int32), mode="drop"
    )  # (D*C,) -> pair index or -1
    slot_valid = inv >= 0
    inv_safe = jnp.maximum(inv, 0)

    send_tok = jnp.where(
        slot_valid[:, None], x[flat_tok[inv_safe]], 0
    ).reshape(d, cap, h)
    send_meta = jnp.stack(
        [
            jnp.where(slot_valid, flat_e[inv_safe] % e_local, 0),
            jnp.where(slot_valid, 1, 0),
        ],
        axis=-1,
    ).reshape(d, cap, 2).astype(jnp.int32)

    # -- exchange: device d's slice i goes to device i ----------------------
    recv_tok = jax.lax.all_to_all(
        send_tok, axis_name, split_axis=0, concat_axis=0, tiled=False
    )  # (D, C, H): slice j came from device j, all routed to MY experts
    recv_meta = jax.lax.all_to_all(
        send_meta, axis_name, split_axis=0, concat_axis=0, tiled=False
    )

    # -- local expert compute (masked dense over the E_local shard) ---------
    rx = recv_tok.reshape(d * cap, h)
    r_expert = recv_meta.reshape(d * cap, 2)[:, 0]
    r_valid = recv_meta.reshape(d * cap, 2)[:, 1] > 0

    from .moe import _expert_einsum_in, _expert_einsum_out

    gate = _expert_einsum_in(rx, gate_w)  # (D*C, E_local, I)
    up = _expert_einsum_in(rx, up_w)
    inter = jax.nn.silu(gate.astype(acc_t)) * up.astype(acc_t)
    emask = (
        jax.nn.one_hot(r_expert, e_local, dtype=acc_t)
        * r_valid[:, None].astype(acc_t)
    )
    inter = (inter * emask[:, :, None]).astype(rx.dtype)
    out_local = _expert_einsum_out(inter, down_w)  # (D*C, H)

    # -- reverse exchange + weighted combine --------------------------------
    back = jax.lax.all_to_all(
        out_local.reshape(d, cap, h), axis_name,
        split_axis=0, concat_axis=0, tiled=False,
    ).reshape(d * cap, h)  # slot layout identical to send

    w_slot = jnp.where(slot_valid, flat_w[inv_safe], 0.0).astype(acc_t)
    tok_slot = jnp.where(slot_valid, flat_tok[inv_safe], n)
    routed = jnp.zeros((n + 1, h), acc_t).at[tok_slot].add(
        back.astype(acc_t) * w_slot[:, None], mode="drop"
    )[:n]
    return routed.astype(x.dtype)


def make_ep_routed_mlp(mesh, cfg, axis_name: str = "ep",
                       capacity_factor: float = 1.5):
    """shard_map wrapper: (x (N,H) replicated, token_ids, full expert stacks
    sharded on E) -> routed output (N, H) replicated.

    Weights enter with their natural (E, H, I)/(E, I, H) layout and the
    standard ``ep`` sharding from parallel/mesh.py; the wrapper sees the
    local (E/D, ...) shard inside.
    """
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    def fn(x, token_ids, gate_w, up_w, down_w, topk_table):
        return ep_all_to_all_routed_experts(
            x, token_ids,
            gate_w=gate_w, up_w=up_w, down_w=down_w,
            topk_table=topk_table,
            num_experts=cfg.num_experts,
            vocab_size=cfg.vocab_size,
            primary_weight=cfg.primary_weight,
            capacity_factor=capacity_factor,
            axis_name=axis_name,
        )

    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name), P()),
        out_specs=P(),
        check_rep=False,
    )
