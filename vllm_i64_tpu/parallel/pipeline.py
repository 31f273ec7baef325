"""Pipeline parallelism: layer-range stages over disjoint device groups.

Reference semantics (ref: vllm_i64/parallel/pipeline_parallel.py:36-118 —
even layer split, activations sent stage-to-stage; pp_utils.py
IntermediateTensors{hidden_states, mu_prev} is the boundary payload).

TPU-native design: parameters are stacked over the layer axis, so a stage
is a pure ``tree_map`` slice ``layers[a:b]`` — no module surgery. Stage
hand-off is ``jax.device_put`` onto the next stage's devices (ICI
transfer under jit; the explicit-collective analog is a Pallas
``make_async_remote_copy``, which the ring patterns in ops/ cover).
On one host this runs stages sequentially — functionally exact, used for
tests; pod deployments give each stage its own mesh.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models import complexity_deep as cdm
from ..ops.norms import rms_norm


def get_pp_indices(num_layers: int, pp_rank: int, pp_size: int
                   ) -> Tuple[int, int]:
    """Even layer split; remainder spread over the first ranks
    (ref: pipeline_parallel.py:85-104)."""
    if pp_size <= 0 or not (0 <= pp_rank < pp_size):
        raise ValueError(f"bad pp_rank/pp_size: {pp_rank}/{pp_size}")
    base = num_layers // pp_size
    extra = num_layers % pp_size
    start = pp_rank * base + min(pp_rank, extra)
    size = base + (1 if pp_rank < extra else 0)
    return start, start + size


def slice_stage_params(params, start: int, end: int):
    """Stage = layer-axis slice of the stacked param pytree."""
    return jax.tree_util.tree_map(lambda x: x[start:end], params["layers"])


class PipelinedModel:
    """Model partitioned into pp_size sequential stages.

    devices: optional per-stage device (or mesh) list; activations are
    device_put between stages."""

    def __init__(self, params, cfg: ModelConfig, pp_size: int,
                 devices: Optional[List] = None):
        if pp_size < 1 or pp_size > cfg.num_hidden_layers:
            raise ValueError(f"pp_size {pp_size} out of range")
        self.cfg = cfg
        self.pp_size = pp_size
        self.devices = devices
        self.bounds = [get_pp_indices(cfg.num_hidden_layers, r, pp_size)
                       for r in range(pp_size)]

        self.stage_layers = []
        for r, (a, b) in enumerate(self.bounds):
            stage = slice_stage_params(params, a, b)
            if devices is not None:
                stage = jax.device_put(stage, devices[r])
            self.stage_layers.append(stage)

        # embedding lives with stage 0; final norm + lm head with the last
        first_dev = devices[0] if devices is not None else None
        last_dev = devices[-1] if devices is not None else None
        self.embed_params = {
            "embed": _put(params["embed"], first_dev),
        }
        if cfg.mu_enabled:
            self.embed_params["mu_init"] = _put(params["mu_init"], first_dev)
        self.head_params = {
            "final_norm": _put(params["final_norm"], last_dev),
            "embed": _put(params["embed"], last_dev),
        }
        if "lm_head" in params:
            self.head_params["lm_head"] = _put(params["lm_head"], last_dev)

    def forward(self, token_ids: jax.Array,
                positions: Optional[jax.Array] = None,
                seq_lens: Optional[jax.Array] = None) -> jax.Array:
        """Cache-free full forward through all stages -> fp32 logits."""
        b, t = token_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(
                jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        if seq_lens is None:
            seq_lens = jnp.full((b,), t, jnp.int32)

        hidden, mu, ids = cdm.embed_tokens(
            self.embed_params, self.cfg, token_ids)
        for r in range(self.pp_size):
            if self.devices is not None:
                hidden = jax.device_put(hidden, self.devices[r])
                if mu is not None:
                    mu = jax.device_put(mu, self.devices[r])
            hidden, mu, _ = cdm.forward_layers(
                self.stage_layers[r], self.cfg, hidden, mu, ids, positions,
                seq_lens=seq_lens,
            )
        if self.devices is not None:
            hidden = jax.device_put(hidden, self.devices[-1])
        hidden = rms_norm(hidden, self.head_params["final_norm"],
                          self.cfg.rms_norm_eps)
        return cdm.lm_logits(self.head_params, self.cfg, hidden)


def _put(x, device):
    return jax.device_put(x, device) if device is not None else x
