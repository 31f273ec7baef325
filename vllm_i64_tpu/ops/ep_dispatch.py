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
  ``C = ceil(K*N/D * capacity_factor)`` are dropped (capacity is a static
  shape, as XLA requires);
- exchange is dense ``(D, C, H)`` — the "ragged" counts ride in a validity
  mask, which is what a fixed-shape SPMD program on TPU wants.

Overflow is NEVER silent (VERDICT r3 item 6):
- both dispatch functions return the exact dropped-pair count when asked
  (``return_overflow=True``) — an on-device integer, identical on every
  device;
- because routing is a pure function of (token_ids, table), the host can
  predict the count exactly without running the model
  (``count_ep_overflow``) — the engine uses this mirror per step when
  ``moe_backend == "ep_a2a"`` and applies ``ModelConfig.ep_overflow_policy``
  ("warn" counts + logs, "error" fails the batch before dispatch);
- ``audit_route_table`` computes, from the table alone, the smallest
  capacity factor that makes dropping IMPOSSIBLE for any token batch
  (policy "never_drop" sizes capacity from it at engine init).

A dropped pair degrades (its ``mix[k] * expert_out`` term is missing from
the combine sum) — it never corrupts other tokens' outputs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .moe import (
    _acc_dtype,
    _expert_einsum_in,
    _expert_einsum_out,
    compute_routes,
)


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


def ep_capacity(num_pairs: int, ep_size: int, capacity_factor: float) -> int:
    """The static per-destination slot count C = ceil(P/D * factor)."""
    return max(1, int(-(-num_pairs // max(ep_size, 1)) * capacity_factor))


def count_ep_overflow(
    token_ids,  # (N,) int — the tokens of one dispatch
    topk_table,  # (K, vocab) int
    *,
    num_experts: int,
    ep_size: int,
    capacity_factor: float = 1.5,
    padded_tokens: Optional[int] = None,
) -> int:
    """Exact dropped-pair count for this batch — the host-side mirror of the
    in-graph capacity drop (routing is deterministic, so this is not an
    estimate). Runs in numpy; safe to call per step.

    ``token_ids`` are the REAL (valid) tokens of one dispatch;
    ``padded_tokens`` is the bucket width N the device program runs at
    (capacity scales with the padded N, but pad rows claim no slots).
    """
    import numpy as np

    ids = np.asarray(token_ids).reshape(-1)
    table = np.asarray(topk_table)
    k, vocab = table.shape
    e_local = num_experts // max(ep_size, 1)
    dest = table[:, np.clip(ids, 0, vocab - 1)] // e_local  # (K, N)
    cap = ep_capacity(k * (padded_tokens or ids.size), ep_size,
                      capacity_factor)
    counts = np.bincount(dest.reshape(-1), minlength=ep_size)
    return int(np.maximum(counts - cap, 0).sum())


def audit_route_table(
    topk_table,  # (K, vocab) int — ONE layer's table
    *,
    num_experts: int,
    ep_size: int,
) -> dict:
    """Static table audit: worst-case and balanced-batch device loads.

    ``m`` = the largest number of a single token's K routes that land on one
    device. An adversarial batch of N copies of that token sends m*N pairs
    to that device, so capacity ``m*N`` — i.e. capacity_factor
    ``m * ep_size / K`` — is PROVABLY drop-free for any batch. ``skew`` is
    the max over devices of (table entries routed there) / (uniform share):
    the expected-load multiplier for uniformly drawn tokens.
    """
    import numpy as np

    table = np.asarray(topk_table)
    k, vocab = table.shape
    e_local = num_experts // max(ep_size, 1)
    dest = table // e_local  # (K, vocab)
    # per-token max same-device multiplicity
    m = 1
    if k > 1:
        per_tok = np.zeros(vocab, np.int64)
        for d in range(ep_size):
            per_tok = np.maximum(per_tok, (dest == d).sum(axis=0))
        m = int(per_tok.max())
    counts = np.bincount(dest.reshape(-1), minlength=ep_size)
    uniform = k * vocab / max(ep_size, 1)
    return {
        "max_same_device_routes": m,
        "safe_capacity_factor": m * ep_size / k,
        "skew": float(counts.max() / max(uniform, 1)),
        "device_route_share": (counts / max(k * vocab, 1)).tolist(),
    }


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
    return_overflow: bool = False,
    valid: Optional[jax.Array] = None,  # (N,) bool — pad rows claim no slots
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
    n_pairs = jnp.int32(p)
    if valid is not None:
        # bucket-padding tokens must not occupy capacity slots (they would
        # evict REAL pairs ranked after them in the k-major flat order)
        pair_ok = jnp.tile(valid.astype(bool), k)
        dest = jnp.where(pair_ok, dest, jnp.asarray(d, dest.dtype))
        n_pairs = jnp.sum(pair_ok.astype(jnp.int32))

    cap = ep_capacity(p, d, capacity_factor)
    onehot = (dest[:, None] == jnp.arange(d, dtype=dest.dtype)[None]).astype(
        jnp.int32
    )  # (P, D) — all-zero rows for invalid pairs (dest == d)
    pos = jnp.take_along_axis(
        jnp.cumsum(onehot, axis=0) - 1,
        jnp.minimum(dest[:, None].astype(jnp.int32), d - 1), axis=1
    )[:, 0]  # rank of pair among its destination's pairs
    keep = (pos < cap) & (dest < d)
    dropped = n_pairs - jnp.sum(keep.astype(jnp.int32))

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
    if return_overflow:
        return routed.astype(x.dtype), dropped
    return routed.astype(x.dtype)


# ---------------------------------------------------------------------------
# Servable EP path (ModelConfig.moe_backend == "ep_a2a")
# ---------------------------------------------------------------------------

# Mesh for the serving EP path. The model functions are pure and meshless;
# the runner sets this at init (same idiom as the W8A8 module flag) so the
# layer body can open a shard_map over the ep/tp axes at trace time.
_EP_MESH = None


def set_ep_mesh(mesh) -> None:
    global _EP_MESH
    _EP_MESH = mesh


def get_ep_mesh():
    return _EP_MESH


def ep_routed_experts(
    x: jax.Array,  # (N, H) tokens, replicated over ep/tp
    token_ids: jax.Array,  # (N,)
    *,
    gate_w,  # flat QTensor (H, E*I) or float stacked (E, H, I)
    up_w,
    down_w,  # flat QTensor (E*I, H) or float stacked (E, I, H)
    topk_table: jax.Array,  # (K, vocab) replicated, bit-exact
    num_experts: int,
    vocab_size: int,
    primary_weight: float,
    capacity_factor: float = 1.5,
    mesh=None,
    return_overflow: bool = False,
    valid: Optional[jax.Array] = None,  # (N,) bool — pad rows claim no slots
) -> jax.Array:
    """Routed-expert output (N, H), computed expert-parallel over the mesh.

    The SERVABLE integration of all-to-all EP dispatch semantics
    (ref: token_routed_i64/layer.py:229-299). In this engine every device
    holds every token row (the step program replicates the batch over the
    ep/tp axes), so the general a2a exchange degenerates: "dispatch" is each
    device *selecting* the (route, token) pairs destined for its local
    experts — capacity-bounded exactly like the a2a form — and the reverse
    exchange + top-k combine degenerate to ONE psum over ep/tp riding ICI.

    Per-device compute: C = ceil(K*N/D * capacity_factor) rows against the
    E/D local experts, vs masked-dense's N rows against E/D experts — the
    EP path wins when ep_size > top_k * capacity_factor (see DESIGN.md for
    the measured crossover). tp composes: the flat E*I axis shards over
    (ep, tp) jointly, and the psum covers both axes.
    """
    mesh = mesh or _EP_MESH
    if mesh is None:
        raise ValueError("ep_routed_experts requires a mesh "
                         "(runner sets it via set_ep_mesh)")
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from .quant import QTensor

    flat = isinstance(gate_w, QTensor) and gate_w.q.ndim == 2
    if not flat and (isinstance(gate_w, QTensor) or getattr(gate_w, "ndim", 0) != 3):
        raise ValueError(
            "ep_a2a moe backend needs float stacked (E, H, I) or flat "
            f"int8 (H, E*I) expert weights, got {type(gate_w).__name__}")

    ep_in_mesh = "ep" in mesh.axis_names
    tp_in_mesh = "tp" in mesh.axis_names
    ep_axes = tuple(a for a, on in (("ep", ep_in_mesh), ("tp", tp_in_mesh)) if on)
    d_ep = mesh.shape.get("ep", 1)
    d_tp = mesh.shape.get("tp", 1) if tp_in_mesh else 1
    if num_experts % max(d_ep, 1):
        # a floored e_local would silently drop every route to the trailing
        # experts (they'd match no device's selection)
        raise ValueError(
            f"num_experts ({num_experts}) not divisible by ep={d_ep}")

    from .quant import PreQuantActs

    if isinstance(x, PreQuantActs):
        # the EP path gathers token rows before its local GEMMs — consume
        # the fused-norm-quant marker as float (identical numerics)
        x = x.to_float()
    x = x.reshape(-1, x.shape[-1])
    n, h = x.shape
    acc_t = _acc_dtype(x.dtype)
    k = topk_table.shape[0]
    p = k * n
    cap = ep_capacity(p, d_ep, capacity_factor)

    def local_fn(x, token_ids, valid_m, topk_table, *weights):
        e_local = num_experts // max(d_ep, 1)
        my = jax.lax.axis_index("ep") if ep_in_mesh else jnp.int32(0)

        routes = compute_routes(topk_table, token_ids, vocab_size)  # (K, N)
        mix = _mix_weights(k, primary_weight, acc_t)  # (K,)
        flat_e = routes.reshape(p)
        flat_tok = jnp.tile(jnp.arange(n, dtype=jnp.int32), k)
        flat_w = jnp.repeat(mix, n)
        dest = flat_e // e_local

        # select MY pairs into capacity slots (over-capacity pairs drop,
        # same fixed-shape discipline as the a2a form above)
        mine = dest == my
        if valid_m is not None:
            # bucket-padding tokens must not occupy capacity slots: ranked
            # in the k-major flat order they would evict REAL pairs
            mine &= jnp.tile(valid_m.astype(bool), k)
        pos = jnp.cumsum(mine.astype(jnp.int32)) - 1
        local_dropped = jnp.sum((mine & (pos >= cap)).astype(jnp.int32))
        slot = jnp.where(mine & (pos < cap), pos, jnp.int32(cap))
        inv = jnp.full((cap,), -1, jnp.int32).at[slot].set(
            jnp.arange(p, dtype=jnp.int32), mode="drop")
        valid = inv >= 0
        inv_safe = jnp.maximum(inv, 0)

        rows = jnp.where(valid[:, None], x[flat_tok[inv_safe]], 0)  # (C, H)
        le = jnp.where(valid, flat_e[inv_safe] % e_local, 0)
        w_slot = jnp.where(valid, flat_w[inv_safe], 0.0).astype(acc_t)
        mask = jax.nn.one_hot(le, e_local, dtype=acc_t) * w_slot[:, None]

        if flat:
            from .fused_swiglu import fused_swiglu
            from .linear import linear

            gq, gs, uq, us, dq, ds = weights
            gate_l, up_l, down_l = QTensor(gq, gs), QTensor(uq, us), QTensor(dq, ds)
            inter = fused_swiglu(rows, gate_l, up_l)  # (C, local_flat)
            # map each LOCAL flat column back to its owning expert: the
            # global flat axis shards ("ep","tp")-major, so this device's
            # chunk starts at (my_ep*d_tp + my_tp) * local_w — with tp > 1
            # a chunk can cover fractional experts, so a uniform
            # repeat(mask, local_w // e_local) would mask the wrong columns
            local_w = inter.shape[-1]
            my_tp = jax.lax.axis_index("tp") if tp_in_mesh else jnp.int32(0)
            i_global = (local_w * d_ep * d_tp) // num_experts
            col0 = (my * d_tp + my_tp) * local_w
            col_e_local = (
                (col0 + jnp.arange(local_w, dtype=jnp.int32)) // i_global
                - my * e_local
            )  # (local_w,) in [0, e_local)
            mask_cols = jnp.take(mask, col_e_local, axis=1)  # (C, local_w)
            inter = (inter.astype(acc_t) * mask_cols).astype(rows.dtype)
            out_rows = linear(inter, down_l)  # (C, H)
        else:
            gate_l, up_l, down_l = weights
            gate = _expert_einsum_in(rows, gate_l)  # (C, e_local, I_local)
            up = _expert_einsum_in(rows, up_l)
            inter = jax.nn.silu(gate.astype(acc_t)) * up.astype(acc_t)
            inter = (inter * mask[:, :, None]).astype(rows.dtype)
            out_rows = _expert_einsum_out(inter, down_l)  # (C, H)

        tok_slot = jnp.where(valid, flat_tok[inv_safe], n)
        routed = jnp.zeros((n + 1, h), acc_t).at[tok_slot].add(
            out_rows.astype(acc_t), mode="drop")[:n]
        for ax in ep_axes:
            routed = jax.lax.psum(routed, ax)
        if not return_overflow:
            return routed.astype(x.dtype)
        # global dropped-pair count: tp replicates the selection, so only
        # the ep axis sums real per-device drops
        dropped = (jax.lax.psum(local_dropped, "ep") if ep_in_mesh
                   else local_dropped)
        return routed.astype(x.dtype), dropped

    ep = "ep" if ep_in_mesh else None
    tp = "tp" if tp_in_mesh else None
    if flat:
        flat_spec = (
            (ep, tp) if (ep and tp) else (ep or tp)
        )  # E*I axis shards over ep (outer) then tp (inner)
        weights = (gate_w.q, gate_w.s, up_w.q, up_w.s, down_w.q, down_w.s)
        w_specs = (
            P(None, flat_spec), P(flat_spec),
            P(None, flat_spec), P(flat_spec),
            P(flat_spec, None), P(None),
        )
    else:
        weights = (gate_w, up_w, down_w)
        w_specs = (P(ep, None, tp), P(ep, None, tp), P(ep, tp, None))

    out_specs = (P(), P()) if return_overflow else P()
    if valid is not None:
        fn = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), *w_specs),
            out_specs=out_specs,
            check_vma=False,
        )
        return fn(x, token_ids, valid, topk_table, *weights)
    fn = shard_map(
        lambda x_, t_, tab_, *w_: local_fn(x_, t_, None, tab_, *w_),
        mesh=mesh,
        in_specs=(P(), P(), P(), *w_specs),
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(x, token_ids, topk_table, *weights)


def make_ep_routed_mlp(mesh, cfg, axis_name: str = "ep",
                       capacity_factor: float = 1.5):
    """shard_map wrapper: (x (N,H) replicated, token_ids, full expert stacks
    sharded on E) -> routed output (N, H) replicated.

    Weights enter with their natural (E, H, I)/(E, I, H) layout and the
    standard ``ep`` sharding from parallel/mesh.py; the wrapper sees the
    local (E/D, ...) shard inside.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

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
        check_vma=False,
    )
