"""Device mesh + sharding rules.

TPU-native replacement for the reference's NCCL process-group parallelism
(ref: vllm_i64/parallel/tensor_parallel.py, token_routed_i64/layer.py):
there is no explicit communication code — a single pjit-compiled step
function runs over a ``jax.sharding.Mesh`` and XLA GSPMD inserts the
collectives (psum over ICI where the reference called dist.all_reduce,
local expert compute where the reference did all_to_all EP dispatch).

Mesh axes:
- ``dp``     data parallel: batch rows of a step (cross-host serving uses
             one engine per host instead; this axis exists for single-
             program scale-out and the driver's dry-run)
- ``ep``     expert parallel: the E axis of expert weight stacks. With the
             masked-dense MoE each device computes its local experts for
             ALL tokens and the down-projection psum combines them — the
             deterministic-routing analog of the reference's
             all_to_all dispatch (token_routed_i64/layer.py:229-299)
- ``tp``     tensor parallel: attention heads + expert/shared intermediate
             (the reference's Column/RowParallelLinear semantics,
             tensor_parallel.py:91-157)

Sharding map (PartitionSpec per parameter leaf):
  q/k/v   (L, H, heads*d)  -> (None, None, 'tp')       column parallel
  o       (L, heads*d, H)  -> (None, 'tp', None)       row parallel + psum
  gate/up (L, E, H, I)     -> (None, 'ep', None, 'tp')
  down    (L, E, I, H)     -> (None, 'ep', 'tp', None) psum over ep+tp
  shared gate/up (L, H, S) -> (None, None, 'tp')
  shared down    (L, S, H) -> (None, 'tp', None)
  embed / norms / tables   -> replicated
  KV cache (L, NB, bs, Hkv, d) -> (None, None, None, 'tp', None)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..config import ModelConfig


@dataclass(frozen=True)
class ParallelConfig:
    dp: int = 1
    ep: int = 1
    tp: int = 1

    @property
    def total(self) -> int:
        return self.dp * self.ep * self.tp


def make_mesh(pcfg: ParallelConfig, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = pcfg.total
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(pcfg.dp, pcfg.ep, pcfg.tp)
    return Mesh(dev_array, axis_names=("dp", "ep", "tp"))


def _layer_specs(cfg: ModelConfig) -> dict:
    specs = {
        "input_ln": P(),
        "q": P(None, None, "tp"),
        "k": P(None, None, "tp"),
        "v": P(None, None, "tp"),
        "qkv": P(None, None, "tp"),  # fused projection (column-parallel)
        "o": P(None, "tp", None),
        "post_ln": P(),
    }
    if cfg.use_qk_norm:
        specs["q_norm"] = P()
        specs["k_norm"] = P()
    if cfg.mu_enabled:
        specs["mu_to_q"] = P(None, None, "tp")
        specs["mu_to_k"] = P(None, None, "tp")
        specs["mu_to_v"] = P(None, None, "tp")
        specs["mu"] = P()
        specs["mu_proj"] = P()
    if cfg.use_token_routed_mlp and cfg.num_experts > 1:
        mlp = {
            "gate": P(None, "ep", None, "tp"),
            "up": P(None, "ep", None, "tp"),
            "down": P(None, "ep", "tp", None),
            "route_table": P(),
        }
        if cfg.shared_expert:
            mlp["shared_gate"] = P(None, None, "tp")
            mlp["shared_up"] = P(None, None, "tp")
            mlp["shared_down"] = P(None, "tp", None)
            if cfg.use_shared_routed_gates:
                mlp["shared_gate_scalar"] = P()
                mlp["routed_gate_scalar"] = P()
        specs["mlp"] = mlp
    elif cfg.learned_moe_enabled:
        specs["mlp"] = {
            "gate": P(None, "ep", None, "tp"),
            "up": P(None, "ep", None, "tp"),
            "down": P(None, "ep", "tp", None),
            "router": P(),  # tiny (H, E) gate — replicate
        }
    else:
        specs["mlp"] = {
            "gate": P(None, None, "tp"),
            "up": P(None, None, "tp"),
            "down": P(None, "tp", None),
        }
    return specs


def param_specs(cfg: ModelConfig) -> dict:
    specs = {
        "embed": P(),
        "final_norm": P(),
        "layers": _layer_specs(cfg),
    }
    if cfg.mu_enabled:
        specs["mu_init"] = P()
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "tp")
    return specs


def kv_cache_spec() -> P:
    # flat pages (L, NB, bs, Hkv*d): the trailing dim flattens head-major,
    # so sharding it over "tp" gives each device a contiguous block of
    # whole kv heads (Hkv % tp == 0 enforced at engine init)
    return P(None, None, None, "tp")


def _spec_for_leaf_path(specs, path):
    node = specs
    for p in path:
        key = getattr(p, "key", None) or getattr(p, "name", None)
        if key is not None and isinstance(node, dict):
            node = node[key]
    return node


def shard_params(params, cfg: ModelConfig, mesh: Mesh):
    """Place a params pytree onto the mesh per the sharding map.

    QTensor leaves inherit the float weight's spec for ``q`` and a reduced
    spec (contraction axis dropped) for the per-out-channel scales.
    """
    from ..ops.quant import Q4Tensor, QTensor

    specs = param_specs(cfg)

    def place(path, leaf):
        spec = _spec_for_leaf_path(specs, path)
        if isinstance(leaf, QTensor):
            if leaf.q.ndim == len(spec) - 1:
                # flat-expert quantized layout: the (E, I)->(E*I) collapse
                # merges the two trailing expert axes; their mesh axes merge
                # too (gate/up (L,E,H,I)->(L,H,E*I): ("ep",)+("tp",) ->
                # ("ep","tp") on the flat axis; down analogous). Any column
                # partition of the flat axis is mathematically valid.
                spec = _flatten_expert_spec(spec, path)
            q_sh = NamedSharding(mesh, spec)
            # scale shape = weight shape minus the contraction axis (-2)
            s_spec = P(*[a for i, a in enumerate(spec) if i != len(spec) - 2])
            return QTensor(
                jax.device_put(leaf.q, q_sh),
                jax.device_put(leaf.s, NamedSharding(mesh, s_spec)),
            )
        if isinstance(leaf, Q4Tensor):
            # int4: the packed payload has the float weight's RANK (the
            # in-axis halves in size, not in rank) so it takes the same
            # (flattened) spec; per-group scales/zeros are small
            # (weights/group_size) and replicate — the dequantize math
            # broadcasts them, and replication avoids group-axis
            # divisibility constraints entirely.
            if leaf.packed.ndim == len(spec) - 1:
                spec = _flatten_expert_spec(spec, path)
            rep = NamedSharding(mesh, P())
            return Q4Tensor(
                jax.device_put(leaf.packed, NamedSharding(mesh, spec)),
                jax.device_put(leaf.scales, rep),
                jax.device_put(leaf.zeros, rep),
                group_size=leaf.group_size,
                layout=leaf.layout,
            )
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(
        place, params, is_leaf=lambda x: isinstance(x, (QTensor, Q4Tensor))
    )


def _flatten_expert_spec(spec: P, path) -> P:
    """Map a stacked (L, E, H, I)/(L, E, I, H) spec onto the flat quantized
    layout (L, H, E*I)/(L, E*I, H)."""
    key = getattr(path[-1], "key", None) or getattr(path[-1], "name", "")
    def merge(*axes):
        flat = tuple(a for a in axes if a is not None)
        return flat if len(flat) > 1 else (flat[0] if flat else None)
    if key in ("gate", "up"):
        # (L, E[ep], H, I[tp]) -> (L, H, E*I[ep,tp])
        return P(spec[0], spec[2], merge(spec[1], spec[3]))
    if key == "down":
        # (L, E[ep], I[tp], H) -> (L, E*I[ep,tp], H)
        return P(spec[0], merge(spec[1], spec[2]), spec[3])
    return spec


def validate_divisibility(cfg: ModelConfig, pcfg: ParallelConfig) -> None:
    """Fail fast when the model doesn't divide onto the mesh."""
    if cfg.num_key_value_heads % pcfg.tp != 0:
        raise ValueError(
            f"num_key_value_heads ({cfg.num_key_value_heads}) not divisible by tp={pcfg.tp}"
        )
    if cfg.num_attention_heads % pcfg.tp != 0:
        raise ValueError(
            f"num_attention_heads ({cfg.num_attention_heads}) not divisible by tp={pcfg.tp}"
        )
    if (cfg.use_token_routed_mlp or cfg.learned_moe_enabled) \
            and cfg.num_experts > 1:
        if cfg.num_experts % pcfg.ep != 0:
            raise ValueError(
                f"num_experts ({cfg.num_experts}) not divisible by ep={pcfg.ep}"
            )
        if cfg.expert_intermediate_size % pcfg.tp != 0:
            raise ValueError(
                f"expert_intermediate_size ({cfg.expert_intermediate_size}) "
                f"not divisible by tp={pcfg.tp}"
            )
        if cfg.shared_expert:
            s = cfg.resolved_shared_intermediate_size
            if s % pcfg.tp != 0:
                raise ValueError(
                    f"shared_intermediate_size ({s}) not divisible by "
                    f"tp={pcfg.tp}")
    else:
        # dense MLP shards gate/up on the intermediate axis — catch the
        # mismatch here with a clear error instead of deep inside GSPMD
        if cfg.intermediate_size % pcfg.tp != 0:
            raise ValueError(
                f"intermediate_size ({cfg.intermediate_size}) not divisible "
                f"by tp={pcfg.tp}")
