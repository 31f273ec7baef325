"""LoRA adapters: hot-swap low-rank deltas onto the serving weights.

Reference behavior (ref: vllm_i64/layers/lora.py + engine API at
i64_engine.py:402-454): load/unload adapters at runtime, integer adapter
ids, one active adapter for the engine.

TPU-native design — **merge-on-activate**: instead of wrapping every linear
with a `base(x) + scale * x@A@B` side path (extra matmuls in the hot loop,
a new program shape per adapter state), activation materializes
``W' = W + scale * (A @ B)`` once and swaps the runner's param pytree. The
compiled step programs are reused as-is (same shapes/dtypes), the hot path
pays ZERO overhead, and deactivation restores the retained base weights.
INT8 weights are dequantized, merged, and requantized.
"""

from __future__ import annotations

import json
import logging
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("vllm_i64_tpu.lora")

# checkpoint projection name -> stacked-param path in the pytree
_TARGET_MAP = {
    "q_proj": ("layers", "q"),
    "k_proj": ("layers", "k"),
    "v_proj": ("layers", "v"),
    "o_proj": ("layers", "o"),
    "gate_proj": ("layers", "mlp", "gate"),
    "up_proj": ("layers", "mlp", "up"),
    "down_proj": ("layers", "mlp", "down"),
    "shared_gate": ("layers", "mlp", "shared_gate"),
    "shared_up": ("layers", "mlp", "shared_up"),
    "shared_down": ("layers", "mlp", "shared_down"),
}

_KEY_RE = re.compile(
    r"layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)\.lora_(A|B)\.weight")


class LoRAAdapter:
    """Parsed adapter: {(layer_idx, target): (A(in,r), B(r,out))} + scaling."""

    def __init__(self, name: str, adapter_id: int):
        self.name = name
        self.adapter_id = adapter_id
        self.scaling = 1.0
        self.rank = 0
        # (layer, target) -> {"A": np, "B": np}
        self.weights: Dict[Tuple[int, str], Dict[str, np.ndarray]] = {}

    @classmethod
    def from_path(cls, name: str, path: str, adapter_id: int) -> "LoRAAdapter":
        p = Path(path)
        adapter = cls(name, adapter_id)

        cfg_path = (p / "adapter_config.json" if p.is_dir()
                    else p.parent / "adapter_config.json")
        if cfg_path.exists():
            with open(cfg_path, encoding="utf-8") as f:
                cfg = json.load(f)
            r = cfg.get("r", cfg.get("rank", 0))
            alpha = cfg.get("lora_alpha", r)
            if r:
                adapter.scaling = float(alpha) / float(r)
                adapter.rank = int(r)

        weight_file = p
        if p.is_dir():
            for cand in ("adapter_model.safetensors", "adapter.safetensors",
                         "model.safetensors"):
                if (p / cand).exists():
                    weight_file = p / cand
                    break
            else:
                raise FileNotFoundError(f"no adapter safetensors in {p}")
        from safetensors import safe_open

        with safe_open(str(weight_file), framework="numpy") as f:
            for key in f.keys():
                m = _KEY_RE.search(key)
                if not m:
                    continue
                layer, target, which = int(m.group(1)), m.group(2), m.group(3)
                if target not in _TARGET_MAP:
                    continue
                w = f.get_tensor(key)
                # torch layout: lora_A (r, in), lora_B (out, r) ->
                # my x@W orientation: A (in, r), B (r, out)
                slot = adapter.weights.setdefault((layer, target), {})
                slot[which] = w.T
                if which == "A":
                    adapter.rank = adapter.rank or w.shape[0]
        if not adapter.weights:
            raise ValueError(f"no LoRA tensors found in {weight_file}")
        return adapter

    def describe(self) -> dict:
        return {"name": self.name, "adapter_id": self.adapter_id,
                "rank": self.rank, "scaling": self.scaling,
                "num_targets": len(self.weights)}


class LoRAManager:
    """Owns adapters + the pristine base params; swaps merged params into
    the engine's runner on activation."""

    def __init__(self, engine, max_adapters: int = 8):
        self.engine = engine
        self.max_adapters = max_adapters
        self._adapters: Dict[str, LoRAAdapter] = {}
        self._next_id = 0
        self.active: Optional[str] = None
        # pristine weights retained for deactivation / re-merge
        self._base_params = engine.runner.params if engine.runner else None

    # -- management ---------------------------------------------------------

    def load_adapter(self, name: str, path: str) -> int:
        if len(self._adapters) >= self.max_adapters:
            raise RuntimeError(f"max adapters ({self.max_adapters}) reached")
        adapter = LoRAAdapter.from_path(name, path, self._next_id)
        self._next_id += 1
        self._adapters[name] = adapter
        logger.info("loaded LoRA '%s' (rank %d, %d targets)",
                    name, adapter.rank, len(adapter.weights))
        return adapter.adapter_id

    def unload_adapter(self, name: str) -> bool:
        if name not in self._adapters:
            return False
        if self.active == name:
            self.set_active(None)
        del self._adapters[name]
        return True

    def list_adapters(self) -> List[dict]:
        return [
            {**a.describe(), "active": a.name == self.active}
            for a in self._adapters.values()
        ]

    # -- activation ---------------------------------------------------------

    def set_active(self, name: Optional[str]) -> None:
        if self.engine.runner is None or self._base_params is None:
            raise RuntimeError("LoRA requires a loaded model")
        if name is None:
            self.engine.runner.params = self._base_params
            self.active = None
            return
        adapter = self._adapters.get(name)
        if adapter is None:
            raise KeyError(f"unknown adapter '{name}'")
        self.engine.runner.params = self._merge(adapter)
        self.active = name
        logger.info("activated LoRA '%s'", name)

    def _merge(self, adapter: LoRAAdapter):
        """base + scale * (A @ B), stacked over layers per target."""
        params = dict(self._base_params)
        params["layers"] = dict(params["layers"])
        if isinstance(params["layers"].get("mlp"), dict):
            params["layers"]["mlp"] = dict(params["layers"]["mlp"])

        by_target: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
        for (layer, target), ab in adapter.weights.items():
            if "A" not in ab or "B" not in ab:
                raise ValueError(
                    f"incomplete LoRA pair at layer {layer} {target}")
            by_target.setdefault(target, {})[layer] = ab

        cfg = self.engine.model_config
        d = cfg.head_dim
        qkv_offsets = {
            "q_proj": (0, cfg.num_attention_heads * d),
            "k_proj": (cfg.num_attention_heads * d,
                       (cfg.num_attention_heads + cfg.num_key_value_heads) * d),
            "v_proj": ((cfg.num_attention_heads + cfg.num_key_value_heads) * d,
                       (cfg.num_attention_heads
                        + 2 * cfg.num_key_value_heads) * d),
        }

        for target, layers in by_target.items():
            path = _TARGET_MAP[target]
            node = params
            for part in path[:-1]:
                node = node[part]
            leaf = node.get(path[-1])
            col_range = None
            if leaf is None and target in qkv_offsets and "qkv" in node:
                # engine fused q/k/v into one projection: merge the delta
                # into this target's column slice of the fused weight
                leaf = node["qkv"]
                path = path[:-1] + ("qkv",)
                col_range = qkv_offsets[target]
            if leaf is None:
                logger.warning("model has no %s — skipping", ".".join(path))
                continue
            node[path[-1]] = self._merged_leaf(
                leaf, layers, adapter.scaling, col_range=col_range)
        return params

    @staticmethod
    def _merged_leaf(leaf, layers: Dict[int, Dict[str, np.ndarray]],
                     scaling: float, col_range=None):
        from ..ops.quant import QTensor, dequantize, quantize_int8

        is_q = isinstance(leaf, QTensor)
        base = dequantize(leaf, jnp.float32) if is_q else leaf
        out = base
        for layer, ab in layers.items():
            delta = (jnp.asarray(ab["A"], jnp.float32)
                     @ jnp.asarray(ab["B"], jnp.float32)) * scaling
            target_shape = (
                (out.shape[1], col_range[1] - col_range[0])
                if col_range is not None else tuple(out.shape[1:]))
            if tuple(delta.shape) != target_shape:
                # e.g. an expert-weight adapter against the fused
                # flat-expert/shared layout — the reference never supports
                # LoRA on stacked expert weights either (auto_wrap only
                # wraps nn.Linear); skip rather than crash the merge
                logger.warning(
                    "LoRA delta %s does not match target %s at layer %d — "
                    "skipping", delta.shape, target_shape, layer)
                continue
            if col_range is not None:
                out = out.at[layer, :, col_range[0]:col_range[1]].add(
                    delta.astype(out.dtype))
            else:
                out = out.at[layer].add(delta.astype(out.dtype))
        if is_q:
            return quantize_int8(out)
        return out
