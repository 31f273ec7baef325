"""Integer-first invariants (ref: tests/test_i64_pipeline.py, 20 tests):
routing, scheduling, KV-block management, and sampling outputs must be
integer end-to-end — float appears only inside the model matmuls."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.core.scheduler import Scheduler
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models.complexity_deep import cyclic_route_table
from vllm_i64_tpu.ops.moe import compute_routes


class TestRoutingIntegers:
    def test_bit_mask_equals_modulo_100k(self):
        """For power-of-two E, (t & (E-1)) == t % E over 100k token ids —
        the reference's core router identity (ref: i64_router.cu:38-71)."""
        ids = np.arange(100_000, dtype=np.int64)
        for e in (2, 4, 8, 16):
            np.testing.assert_array_equal(ids & (e - 1), ids % e)

    def test_cyclic_table_uniform_distribution(self):
        t = cyclic_route_table(vocab_size=32_000, num_experts=4, top_k=2)
        for k in range(2):
            counts = np.bincount(t[k], minlength=4)
            assert counts.max() - counts.min() <= 1  # perfectly balanced

    def test_route_table_is_integer(self):
        t = cyclic_route_table(256, 4, 2)
        assert np.issubdtype(t.dtype, np.integer)

    def test_compute_routes_integer_output(self):
        table = jnp.asarray(cyclic_route_table(256, 4, 2))
        routes = compute_routes(table, jnp.asarray([5, 300, -3]), 256)
        assert jnp.issubdtype(routes.dtype, jnp.integer)
        # clamped out-of-range ids stay in range
        assert int(routes.max()) < 4 and int(routes.min()) >= 0

    def test_top_k_routes_distinct_by_construction(self):
        t = cyclic_route_table(1000, 4, 2)
        assert (t[0] != t[1]).all()  # (id+0)%E != (id+1)%E for E>1


class TestSchedulerIntegers:
    def make(self):
        return Scheduler(max_batch_size=4, max_seq_len=64, kv_block_size=4,
                         max_kv_blocks=32, max_prefill_tokens=16)

    def test_request_state_integer(self):
        s = self.make()
        rid = s.add_request(np.arange(10), max_new_tokens=4)
        assert isinstance(rid, int)
        req = s.get_request(rid)
        assert req.prompt_token_ids.dtype == np.int64
        assert isinstance(req.max_new_tokens, int)
        assert isinstance(req.priority, int)

    def test_batch_arrays_integer(self):
        s = self.make()
        s.add_request(np.arange(10), max_new_tokens=4)
        batch = s.schedule()
        for seq in batch.seqs:
            assert np.issubdtype(seq.token_ids.dtype, np.integer)
            assert np.issubdtype(seq.positions.dtype, np.integer)
            assert all(isinstance(b, int) for b in seq.request.kv_block_ids)

    def test_kv_blocks_integer(self):
        s = self.make()
        s.add_request(np.arange(10), max_new_tokens=4)
        s.schedule()
        req = next(iter(s.running))
        assert all(isinstance(b, (int, np.integer))
                   for b in req.kv_block_ids)
        assert isinstance(s.blocks.num_free, int)

    def test_stats_all_integer(self):
        s = self.make()
        s.add_request(np.arange(6), max_new_tokens=2)
        s.schedule()
        for k, v in s.get_stats().items():
            assert isinstance(v, (int, np.integer)), (k, type(v))

    def test_scheduler_module_no_float_state(self):
        """No float creeps into scheduling decisions: run a workload and
        check every tracked request field stays integer."""
        s = self.make()
        for i in range(4):
            s.add_request(np.arange(5 + i), max_new_tokens=3)
        for _ in range(6):
            b = s.schedule()
            if b is None:
                break
            s.update_after_step(
                b, {q.request.request_id: 7 for q in b.seqs if q.needs_sample})
        for req in s._requests.values():
            assert isinstance(req.prefill_done, int)
            assert isinstance(req.restore_extra, int)
            assert all(isinstance(t, int) for t in req.output_token_ids)


class TestSamplingIntegers:
    def test_device_sampler_returns_int32(self):
        from vllm_i64_tpu.core.sampling import SamplerFeatures, sample_tokens

        logits = jnp.zeros((2, 16), jnp.float32)
        toks = sample_tokens(
            logits, features=SamplerFeatures(), key=jax.random.PRNGKey(0),
            temperature=np.zeros(2, np.float32),
            top_k=np.zeros(2, np.int32), top_p=np.ones(2, np.float32),
            min_p=np.zeros(2, np.float32), typical_p=np.ones(2, np.float32),
            rep_pen=np.ones(2, np.float32), freq_pen=np.zeros(2, np.float32),
            pres_pen=np.zeros(2, np.float32), seeds=np.zeros(2, np.int32),
            gen_index=np.zeros(2, np.int32),
            eos_suppress=np.zeros(2, bool), eos_ids=np.zeros(2, np.int32),
            min_tokens=np.zeros(2, np.int32))
        assert toks.dtype == jnp.int32

    def test_modelless_engine_outputs_python_ints(self):
        ecfg = EngineConfig(
            max_batch_size=2, max_seq_len=32, kv_block_size=4,
            max_kv_blocks=16, decode_batch_buckets=(1, 2),
            prefill_batch_buckets=(1, 2), prefill_token_buckets=(8,))
        eng = Engine(None, None, ecfg)
        r = eng.generate([3, 5, 7], SamplingParams(temperature=0.0,
                                                   max_tokens=4))
        assert all(isinstance(t, int) for t in r.output_tokens)

    def test_modelless_engine_stats_integerish(self):
        ecfg = EngineConfig(
            max_batch_size=2, max_seq_len=32, kv_block_size=4,
            max_kv_blocks=16, decode_batch_buckets=(1, 2),
            prefill_batch_buckets=(1, 2), prefill_token_buckets=(8,))
        eng = Engine(None, None, ecfg)
        eng.generate([3, 5], SamplingParams(temperature=0.0, max_tokens=2))
        stats = eng.get_stats()
        for k in ("pending", "running", "finished", "free_kv_blocks",
                  "total_steps", "total_tokens_generated"):
            assert isinstance(stats[k], (int, np.integer)), k


class TestModelIntegerBoundary:
    def test_expert_ids_derivable_prestep(self):
        """Routing is a pure function of token ids — the scheduler-side
        pre-routing the reference computes (i64_scheduler.py:293-298) is
        reproducible host-side with the same table."""
        table = cyclic_route_table(256, 4, 2)
        ids = np.asarray([5, 17, 42], np.int64)
        host = table[:, ids]
        dev = np.asarray(compute_routes(
            jnp.asarray(table), jnp.asarray(ids), 256))
        np.testing.assert_array_equal(host, dev)

    def test_only_matmul_zone_is_float(self):
        """End-to-end: prompt ints in, token ints out, with a real model."""
        cfg = ModelConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            num_experts=4, top_k=2)
        from vllm_i64_tpu.models import complexity_deep as cdm

        params = cdm.init_params(cfg, jax.random.PRNGKey(0))
        ecfg = EngineConfig(
            max_batch_size=2, max_seq_len=32, kv_block_size=4,
            max_kv_blocks=16, dtype="float32", kv_cache_dtype="float32",
            decode_batch_buckets=(1, 2), prefill_batch_buckets=(1, 2),
            prefill_token_buckets=(8, 16), multistep_decode=1,
            decode_chaining=False)
        r = Engine(params, cfg, ecfg).generate(
            [3, 5, 7], SamplingParams(temperature=0.0, max_tokens=4))
        assert all(isinstance(t, int) for t in r.output_tokens)
        assert all(0 <= t < cfg.vocab_size for t in r.output_tokens)
