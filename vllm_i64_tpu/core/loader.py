"""Checkpoint loading: HF-format state dicts -> stacked JAX param pytrees.

TPU-native re-design of the reference weight loader
(ref: vllm_i64/core/loader.py:34-651). Differences by design:

- the target is a *functional pytree* with parameters stacked over the layer
  axis (one (L, ...) array per weight kind) — built in one pass with numpy
  stacking, no module tree walking, no per-parameter ``copy_``.
- sharding is GSPMD: the full weights are built host-side and placed with
  ``jax.device_put(x, NamedSharding)`` — there is no per-rank shard
  arithmetic (the reference's Column/RowParallel ``load_full_weight``,
  loader.py:297-518, is replaced by the mesh param specs).

Semantics preserved from the reference:
- multi-format state-dict loading: sharded/single safetensors, .pt/.bin,
  directories (loader.py:101-189)
- framework-format conversion of ``mlp.experts.N.*`` checkpoints
  (loader.py:192-280)
- **exact ``topk_token_to_expert`` table load** [top_k, vocab] — required
  for TR-HASH bit-exactness; cyclic derivation only for legacy
  single-route checkpoints (loader.py:374-407)
- tied embeddings via lm_head <-> embed_tokens (loader.py:360-372)
- strict-mode missing/unloaded reporting (loader.py:494-518)
"""

from __future__ import annotations

import json
import logging
import os
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig

logger = logging.getLogger("vllm_i64_tpu.loader")

StateDict = Dict[str, np.ndarray]


# ---------------------------------------------------------------------------
# Checkpoint source resolution
# ---------------------------------------------------------------------------


def resolve_checkpoint_source(source: str) -> str:
    """Resolve a checkpoint reference to a local path.

    Local paths pass through; HF hub ids are downloaded via huggingface_hub
    when the environment allows it (ref: loader.py:34-54).
    ``VLLM_I64_TPU_CKPT_DIR`` provides an offline lookup root.
    """
    p = Path(source)
    if p.exists():
        return str(p)

    root = os.environ.get("VLLM_I64_TPU_CKPT_DIR")
    if root:
        candidate = Path(root) / source.replace("/", "--")
        if candidate.exists():
            return str(candidate)
        candidate = Path(root) / source
        if candidate.exists():
            return str(candidate)

    if "/" in source and not source.startswith((".", "/")):
        try:
            from huggingface_hub import snapshot_download

            return snapshot_download(repo_id=source)
        except Exception as exc:  # no network / missing repo
            raise FileNotFoundError(
                f"Checkpoint '{source}' not found locally and hub download "
                f"failed ({exc}). Set VLLM_I64_TPU_CKPT_DIR or pass a local path."
            ) from exc
    raise FileNotFoundError(f"Checkpoint not found: {source}")


# ---------------------------------------------------------------------------
# State-dict loading (multi-format)
# ---------------------------------------------------------------------------


def _load_safetensors_file(filepath: str) -> StateDict:
    from safetensors import safe_open

    out: StateDict = {}
    with safe_open(filepath, framework="numpy") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out


def _load_torch_file(filepath: str) -> StateDict:
    """Load a torch .pt/.bin checkpoint and convert tensors to numpy."""
    import torch

    sd = torch.load(filepath, map_location="cpu", weights_only=True)
    if isinstance(sd, dict):
        if "model" in sd and not any(k.startswith("layers.") for k in sd):
            inner = sd["model"]
            if isinstance(inner, dict):
                sd = inner
        if "state_dict" in sd:
            sd = sd["state_dict"]
    out: StateDict = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            t = v.detach().cpu()
            if t.dtype == torch.bfloat16:
                t = t.float()
            out[k] = t.numpy()
        else:
            out[k] = np.asarray(v)
    return out


def _load_sharded_safetensors(directory: Path) -> StateDict:
    with open(directory / "model.safetensors.index.json", encoding="utf-8") as f:
        index = json.load(f)
    out: StateDict = {}
    for shard in sorted(set(index.get("weight_map", {}).values())):
        shard_path = directory / shard
        if not shard_path.exists():
            raise FileNotFoundError(f"Shard not found: {shard_path}")
        out.update(_load_safetensors_file(str(shard_path)))
    return out


def load_state_dict(checkpoint_path: str) -> StateDict:
    """Auto-detect format and load as numpy arrays (ref: loader.py:168-189)."""
    path = Path(checkpoint_path)
    if path.is_dir():
        if (path / "model.safetensors.index.json").exists():
            return _load_sharded_safetensors(path)
        if (path / "model.safetensors").exists():
            return _load_safetensors_file(str(path / "model.safetensors"))
        st = sorted(path.glob("*.safetensors"))
        if st:
            out: StateDict = {}
            for f in st:
                out.update(_load_safetensors_file(str(f)))
            return out
        pt = (
            sorted(path.glob("*.pt"))
            + sorted(path.glob("*.pth"))
            + sorted(path.glob("*.bin"))
        )
        if pt:
            out = {}
            for f in pt:
                out.update(_load_torch_file(str(f)))
            return out
        raise FileNotFoundError(f"No checkpoint files found in {path}")
    if path.suffix == ".safetensors":
        return _load_safetensors_file(str(path))
    return _load_torch_file(str(path))


# ---------------------------------------------------------------------------
# Framework-format conversion
# ---------------------------------------------------------------------------

# optional "model." prefix: conversion runs BEFORE _KeyView strips it, and
# standard HF checkpoints carry it on every key — an anchored match without
# it silently skipped conversion and loaded MoE models with no expert
# weights at all
_EXPERT_RE = re.compile(
    r"(?:model\.)?(layers\.\d+)\.mlp\.experts\.(\d+)"
    r"\.(gate_proj|up_proj|down_proj)\.weight"
)


def convert_framework_weights(sd: StateDict) -> StateDict:
    """Convert ``mlp.experts.N.{gate,up,down}_proj`` checkpoints to the
    stacked native layout (ref: loader.py:192-280).

    Native layout produced here (matches TokenRoutedMLP params):
      gate_proj_w/up_proj_w: (E, H, I) — x @ w orientation,
      down_proj_w: (E, I, H).
    """
    if not any(_EXPERT_RE.match(k) for k in sd):
        return sd

    converted: StateDict = {}
    experts: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    for name, w in sd.items():
        m = _EXPERT_RE.match(name)
        if m:
            layer, eid, proj = m.group(1), int(m.group(2)), m.group(3)
            experts.setdefault(layer, {}).setdefault(eid, {})[proj] = w
            continue
        converted[name] = w

    from .awq_gptq import Q4Parts

    def stack_experts(emap, proj, n):
        ws = [emap[e][proj] for e in range(n)]
        if any(isinstance(w, Q4Parts) for w in ws):
            if not all(isinstance(w, Q4Parts) for w in ws):
                raise ValueError(
                    f"{proj}: experts mix direct-int4 and float tensors")
            return _stack_q4(ws)  # Q4Parts already (in, out) oriented
        # torch Linear stores (out, in): gate/up are (I, H), down is (H, I)
        return np.stack([w.T for w in ws])

    for layer, emap in experts.items():
        n = max(emap) + 1
        converted[f"{layer}.mlp.gate_proj_w"] = stack_experts(emap, "gate_proj", n)
        converted[f"{layer}.mlp.up_proj_w"] = stack_experts(emap, "up_proj", n)
        converted[f"{layer}.mlp.down_proj_w"] = stack_experts(emap, "down_proj", n)
    return converted


# ---------------------------------------------------------------------------
# Pytree assembly
# ---------------------------------------------------------------------------


class _KeyView:
    """Prefix-stripping view over the raw state dict with load tracking."""

    def __init__(self, sd: StateDict):
        self.sd: StateDict = {}
        for k, v in sd.items():
            self.sd[k[6:] if k.startswith("model.") else k] = v
        self.used: set = set()

    def take(self, key: str) -> Optional[np.ndarray]:
        if key in self.sd:
            self.used.add(key)
            return self.sd[key]
        return None

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _stack_q4(rows) -> "object":
    """Stack per-layer/per-expert Q4Parts into one leading-axis Q4Parts."""
    from .awq_gptq import Q4Parts

    return Q4Parts(
        packed=np.stack([r.packed for r in rows]),
        scales=np.stack([r.scales for r in rows]),
        zeros=np.stack([r.zeros for r in rows]),
        group_size=rows[0].group_size,
    )


def _stack_layers(view: _KeyView, num_layers: int, template: str, *, transpose=False,
                  required=True, missing=None) -> Optional[np.ndarray]:
    """Collect ``template.format(i)`` for all layers and stack to (L, ...)."""
    from .awq_gptq import Q4Parts

    rows = []
    for i in range(num_layers):
        w = view.take(template.format(i))
        if w is None:
            if required and missing is not None:
                missing.append(template.format(i))
            return None
        if isinstance(w, Q4Parts):
            rows.append(w)  # already (in, out) oriented — never transpose
        else:
            rows.append(w.T if transpose else w)
    if any(isinstance(r, Q4Parts) for r in rows):
        if not all(isinstance(r, Q4Parts) for r in rows):
            raise ValueError(
                f"{template}: layers mix direct-int4 and float tensors")
        return _stack_q4(rows)
    return np.stack(rows)


def build_params(
    cfg: ModelConfig,
    state_dict: StateDict,
    dtype=jnp.bfloat16,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Assemble the stacked-layer param pytree from a converted state dict.

    Returns (params, stats). stats mirrors the reference loader report
    (loaded / skipped / missing_in_model / unloaded_params,
    ref: loader.py:494-518).
    """
    sd = convert_framework_weights(state_dict)
    view = _KeyView(sd)
    L = cfg.num_hidden_layers
    missing: list = []

    def cast(x):
        from ..ops.quant import Q4Tensor
        from .awq_gptq import Q4Parts

        if x is None:
            return None
        if isinstance(x, Q4Parts):
            # direct int4 serve: components become a Q4Tensor leaf verbatim
            return Q4Tensor(
                jnp.asarray(x.packed),
                jnp.asarray(x.scales, jnp.float32),
                jnp.asarray(x.zeros, jnp.float32),
                group_size=x.group_size,
            )
        return jnp.asarray(np.asarray(x), dtype=dtype)

    # --- embeddings (tied lm_head <-> embed_tokens, ref: loader.py:360-372)
    embed = view.take("embed_tokens.weight")
    lm_head = view.take("lm_head.weight")
    if embed is None and lm_head is not None:
        embed = lm_head
    if embed is None:
        missing.append("embed_tokens.weight")
        embed = np.zeros((cfg.vocab_size, cfg.hidden_size), np.float32)

    final_norm = view.take("norm.weight")
    if final_norm is None:
        missing.append("norm.weight")
        final_norm = np.ones((cfg.hidden_size,), np.float32)

    layers: Dict[str, Any] = {}
    layers["input_ln"] = cast(
        _stack_layers(view, L, "layers.{}.input_layernorm.weight", missing=missing)
        if L else None
    )
    layers["q"] = cast(_stack_layers(
        view, L, "layers.{}.self_attn.q_proj.weight", transpose=True, missing=missing))
    layers["k"] = cast(_stack_layers(
        view, L, "layers.{}.self_attn.k_proj.weight", transpose=True, missing=missing))
    layers["v"] = cast(_stack_layers(
        view, L, "layers.{}.self_attn.v_proj.weight", transpose=True, missing=missing))
    layers["o"] = cast(_stack_layers(
        view, L, "layers.{}.self_attn.o_proj.weight", transpose=True, missing=missing))
    layers["post_ln"] = cast(_stack_layers(
        view, L, "layers.{}.post_attention_layernorm.weight", missing=missing))

    if cfg.use_qk_norm:
        qn = _stack_layers(view, L, "layers.{}.self_attn.q_norm.weight", required=False)
        kn = _stack_layers(view, L, "layers.{}.self_attn.k_norm.weight", required=False)
        layers["q_norm"] = cast(qn) if qn is not None else jnp.ones(
            (L, cfg.head_dim), dtype)
        layers["k_norm"] = cast(kn) if kn is not None else jnp.ones(
            (L, cfg.head_dim), dtype)

    if cfg.mu_enabled:
        layers["mu_to_q"] = cast(_stack_layers(
            view, L, "layers.{}.self_attn.mu_to_q.weight", transpose=True,
            missing=missing))
        layers["mu_to_k"] = cast(_stack_layers(
            view, L, "layers.{}.self_attn.mu_to_k.weight", transpose=True,
            missing=missing))
        layers["mu_to_v"] = cast(_stack_layers(
            view, L, "layers.{}.self_attn.mu_to_v.weight", transpose=True,
            missing=missing))
        layers["mu"] = cast(_stack_layers(
            view, L, "layers.{}.mu_guidance.mu", missing=missing))
        layers["mu_proj"] = cast(_stack_layers(
            view, L, "layers.{}.mu_guidance.mu_proj.weight", transpose=True,
            missing=missing))

    # --- MLP
    if cfg.use_token_routed_mlp and cfg.num_experts > 1:
        mlp: Dict[str, Any] = {}
        mlp["gate"] = cast(_stack_layers(
            view, L, "layers.{}.mlp.gate_proj_w", missing=missing))
        mlp["up"] = cast(_stack_layers(
            view, L, "layers.{}.mlp.up_proj_w", missing=missing))
        mlp["down"] = cast(_stack_layers(
            view, L, "layers.{}.mlp.down_proj_w", missing=missing))
        mlp["route_table"] = _load_route_tables(view, cfg, missing)
        if cfg.shared_expert:
            mlp["shared_gate"] = cast(_stack_layers(
                view, L, "layers.{}.mlp.shared_gate.weight", transpose=True,
                missing=missing))
            mlp["shared_up"] = cast(_stack_layers(
                view, L, "layers.{}.mlp.shared_up.weight", transpose=True,
                missing=missing))
            mlp["shared_down"] = cast(_stack_layers(
                view, L, "layers.{}.mlp.shared_down.weight", transpose=True,
                missing=missing))
            if cfg.use_shared_routed_gates:
                sg = _stack_layers(
                    view, L, "layers.{}.mlp.shared_output_gate", required=False)
                rg = _stack_layers(
                    view, L, "layers.{}.mlp.routed_output_gate", required=False)
                mlp["shared_gate_scalar"] = (
                    cast(np.reshape(sg, (L,))) if sg is not None
                    else jnp.full((L,), cfg.shared_gate_init, dtype))
                mlp["routed_gate_scalar"] = (
                    cast(np.reshape(rg, (L,))) if rg is not None
                    else jnp.full((L,), cfg.routed_gate_init, dtype))
        layers["mlp"] = mlp
    elif cfg.learned_moe_enabled:
        # learned-gate MoE: stacked expert weights (from the experts.N.*
        # conversion) + the (H, E) router (ref: layers/moe.py MixtralMoE)
        layers["mlp"] = {
            "gate": cast(_stack_layers(
                view, L, "layers.{}.mlp.gate_proj_w", missing=missing)),
            "up": cast(_stack_layers(
                view, L, "layers.{}.mlp.up_proj_w", missing=missing)),
            "down": cast(_stack_layers(
                view, L, "layers.{}.mlp.down_proj_w", missing=missing)),
            "router": cast(
                _stack_layers(view, L, "layers.{}.mlp.router.weight",
                              transpose=True, required=False)
                if any(f"layers.{i}.mlp.router.weight" in view.sd
                       for i in range(L))
                else _stack_layers(view, L, "layers.{}.mlp.gate.weight",
                                   transpose=True, missing=missing)),
        }
    else:
        layers["mlp"] = {
            "gate": cast(_stack_layers(
                view, L, "layers.{}.mlp.gate_proj.weight", transpose=True,
                missing=missing)),
            "up": cast(_stack_layers(
                view, L, "layers.{}.mlp.up_proj.weight", transpose=True,
                missing=missing)),
            "down": cast(_stack_layers(
                view, L, "layers.{}.mlp.down_proj.weight", transpose=True,
                missing=missing)),
        }

    params: Dict[str, Any] = {
        "embed": cast(embed),
        "final_norm": cast(final_norm),
        "layers": layers,
    }
    if cfg.mu_enabled:
        mu_init = view.take("mu_init")
        params["mu_init"] = (
            cast(np.reshape(mu_init, (cfg.hidden_size,))) if mu_init is not None
            else jnp.zeros((cfg.hidden_size,), dtype))
    if not cfg.tie_word_embeddings:
        lm = lm_head if lm_head is not None else None
        if lm is None:
            missing.append("lm_head.weight")
            params["lm_head"] = jnp.zeros((cfg.hidden_size, cfg.vocab_size), dtype)
        else:
            params["lm_head"] = cast(lm.T)

    skipped = [k for k in view.unused() if "rotary_emb.inv_freq" in k
               or k == "lm_head.weight" or k.endswith(".token_to_expert")]
    unused = [k for k in view.unused() if k not in skipped]
    stats = {
        "loaded": len(view.used),
        "skipped": len(skipped),
        "missing_in_model": len(unused),
        "unused_keys": unused,
        "unloaded_params": len(missing),
        "missing_keys": missing,
    }
    return params, stats


def _load_route_tables(view: _KeyView, cfg: ModelConfig, missing: list) -> jnp.ndarray:
    """Load exact per-layer [top_k, vocab] routing tables.

    Exact table load is REQUIRED for TR-HASH correctness — deriving cyclic
    routes would change the trained model (ref: loader.py:374-387). Legacy
    checkpoints storing only the primary route derive route k as
    (primary + k) % E (ref: loader.py:389-407).
    """
    L, K, V, E = (cfg.num_hidden_layers, cfg.effective_top_k,
                  cfg.vocab_size, cfg.num_experts)
    tables = []
    for i in range(L):
        topk = view.take(f"layers.{i}.mlp.topk_token_to_expert")
        if topk is not None:
            t = np.asarray(topk, np.int32)
            if t.shape != (K, V):
                raise ValueError(
                    f"layer {i}: topk_token_to_expert shape {t.shape} != {(K, V)}")
            tables.append(t)
            continue
        primary = view.take(f"layers.{i}.mlp.token_to_expert")
        if primary is not None:
            p = np.asarray(primary, np.int64)
            tables.append(np.stack([(p + r) % E for r in range(K)]).astype(np.int32))
            continue
        # modulo_cyclic default (ref: token_routed_mlp.py:92-107)
        ids = np.arange(V, dtype=np.int64)
        tables.append(np.stack([(ids + r) % E for r in range(K)]).astype(np.int32))
    return jnp.asarray(np.stack(tables))


# ---------------------------------------------------------------------------
# Top-level entry points
# ---------------------------------------------------------------------------


def load_model(
    checkpoint: str,
    dtype=jnp.bfloat16,
    config: Optional[ModelConfig] = None,
    strict: bool = False,
    int4_direct: bool = True,
) -> Tuple[Dict[str, Any], ModelConfig, Dict[str, Any]]:
    """Load (params, config, stats) from a checkpoint path or hub id
    (ref: load_model_by_name, loader.py:535-651 — quantization is applied
    separately by core.quantize_model).

    int4_direct: serve AWQ/GPTQ checkpoints as Q4Tensor leaves without the
    dequant->requant round-trip (bit-identical to the float conversion;
    False forces the float path for comparison)."""
    path = Path(resolve_checkpoint_source(checkpoint))
    if config is None:
        cfg_path = path / "config.json" if path.is_dir() else path.parent / "config.json"
        if not cfg_path.exists():
            raise FileNotFoundError(
                f"config.json not found next to checkpoint {path}")
        config = ModelConfig.from_json(str(cfg_path))
    sd = load_state_dict(str(path))

    # AWQ/GPTQ pre-quantized checkpoints: unpack + dequantize to float
    # (ref: awq_gptq.py load_awq/gptq_checkpoint); serving re-quantization
    # happens in core/quantize_model.py
    from .awq_gptq import convert_quantized_state_dict, detect_quant_config

    detection = detect_quant_config(str(path))
    if detection is not None:
        _, qcfg = detection
        sd = convert_quantized_state_dict(sd, qcfg, direct=int4_direct)

    params, stats = build_params(config, sd, dtype=dtype)
    if stats["unloaded_params"]:
        msg = (f"{stats['unloaded_params']} model params had no checkpoint "
               f"tensor: {stats['missing_keys'][:8]}")
        if strict:
            raise RuntimeError(msg)
        logger.warning(msg)
    if stats["missing_in_model"]:
        logger.warning("%d checkpoint tensors not in model: %s",
                       stats["missing_in_model"], stats["unused_keys"][:8])
    logger.info("Loaded %d tensors from %s", stats["loaded"], path)
    return params, config, stats


def load_model_by_name(
    name: str,
    dtype=jnp.bfloat16,
    strict: bool = False,
) -> Tuple[Dict[str, Any], ModelConfig, Dict[str, Any]]:
    """Registry-name load (ref: loader.py:535-651). Falls back to treating
    ``name`` as a path when it is not registered."""
    from ..models.registry import get_model_entry

    try:
        entry = get_model_entry(name)
        checkpoint = entry.checkpoint
    except KeyError:
        checkpoint = name
    return load_model(checkpoint, dtype=dtype, strict=strict)
