"""HBM-measured KV pool auto-sizing (vLLM's gpu_memory_utilization analog)."""

import jax
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.engine.runner import _auto_kv_blocks
from vllm_i64_tpu.models import complexity_deep as cdm


class FakeDevice:
    platform = "tpu"

    def __init__(self, limit, in_use):
        self._s = {"bytes_limit": limit, "bytes_in_use": in_use}

    def memory_stats(self):
        return self._s


class NoStatsDevice:
    platform = "tpu"

    def memory_stats(self):
        raise RuntimeError("unsupported")


def test_cpu_devices_never_auto_size():
    """Host platforms must keep the static heuristic — sizing a pool to
    host RAM would explode CPU test configs."""
    dev = FakeDevice(limit=256 << 30, in_use=0)
    dev.platform = "cpu"
    assert _auto_kv_blocks(dev, 1 << 20, EngineConfig(), fallback=33) == 33


def test_auto_blocks_fills_budget():
    ecfg = EngineConfig(hbm_utilization=0.9)
    per_block = 1 << 20  # 1 MB
    dev = FakeDevice(limit=16 << 30, in_use=2 << 30)
    # budget = 0.9*16G - 2G - 0.5G headroom = ~11.9G -> ~12.2k blocks
    blocks = _auto_kv_blocks(dev, per_block, ecfg, fallback=256)
    assert 11_000 < blocks < 13_000


def test_auto_blocks_fallback_without_stats():
    ecfg = EngineConfig()
    assert _auto_kv_blocks(NoStatsDevice(), 1 << 20, ecfg, fallback=256) == 256


def test_auto_blocks_respects_utilization_knob():
    per_block = 1 << 20
    dev = FakeDevice(limit=16 << 30, in_use=0)
    lo = _auto_kv_blocks(
        dev, per_block, EngineConfig(hbm_utilization=0.5), fallback=16)
    hi = _auto_kv_blocks(
        dev, per_block, EngineConfig(hbm_utilization=0.95), fallback=16)
    assert hi > lo > 0


def test_auto_blocks_tight_budget_falls_back():
    ecfg = EngineConfig()
    dev = FakeDevice(limit=1 << 30, in_use=900 << 20)  # < headroom free
    assert _auto_kv_blocks(dev, 1 << 20, ecfg, fallback=64) == 64


def test_engine_scheduler_matches_runner_block_count(monkeypatch):
    """The scheduler pool must always equal the runner's allocated cache,
    including when the measured count differs from the static heuristic."""
    import vllm_i64_tpu.engine.runner as runner_mod

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, num_experts=4, top_k=2,
    )
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))

    monkeypatch.setattr(runner_mod, "_auto_kv_blocks",
                        lambda dev, pb, ec, fb: 77)
    ecfg = EngineConfig(
        max_batch_size=2, max_seq_len=64, kv_block_size=8, max_kv_blocks=0,
        max_prefill_tokens=32, dtype="float32", kv_cache_dtype="float32",
        decode_batch_buckets=(1, 2), prefill_batch_buckets=(1, 2),
        prefill_token_buckets=(16,), multistep_decode=1,
        decode_chaining=False,
    )
    eng = Engine(params, cfg, ecfg)
    assert eng.runner.num_blocks == 77
    assert eng.runner.kv_k.shape[1] == 77
    assert eng.scheduler.blocks.num_blocks == 77
    # and it still serves
    r = eng.generate([5, 17, 42], SamplingParams(temperature=0.0, max_tokens=4))
    assert len(r.output_tokens) == 4
