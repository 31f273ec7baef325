"""Disaggregated prefill/decode tests (ref: vllm_i64/parallel/disaggregated.py,
tests driven single-process; workers on separate runners)."""

import jax
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.parallel.disaggregated import (
    DecodeWorker,
    PrefillWorker,
    setup_disaggregated,
)


@pytest.fixture(scope="module")
def setup(request):
    cfg = request.getfixturevalue("tiny_config")
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=64, max_prefill_tokens=64,
                        dtype="float32", kv_cache_dtype="float32",
                        decode_batch_buckets=(1, 2, 4),
                        prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16, 32), multistep_decode=1)
    return params, cfg, ecfg


def test_prefill_worker_produces_first_token_and_kv(setup):
    params, cfg, ecfg = setup
    pw = PrefillWorker(params, cfg, ecfg)
    prompt = [5, 17, 42, 7, 9]
    pr = pw.run_prefill(prompt, SamplingParams(temperature=0.0, max_tokens=4))
    assert 0 <= pr.first_token < cfg.vocab_size
    assert pr.prompt_len == 5
    assert len(pr.kv_blocks) == 2  # ceil(5/4)
    k0, v0 = next(iter(pr.kv_blocks.values()))
    assert k0.shape[0] == cfg.num_hidden_layers
    assert np.abs(k0).sum() > 0  # real KV content


def test_prefill_first_token_matches_plain_engine(setup):
    params, cfg, ecfg = setup
    prompt = [5, 17, 42, 7, 9]
    plain = Engine(params, cfg, ecfg).generate(
        prompt, SamplingParams(temperature=0.0, max_tokens=1))
    pw = PrefillWorker(params, cfg, ecfg)
    pr = pw.run_prefill(prompt, SamplingParams(temperature=0.0, max_tokens=1))
    assert pr.first_token == plain.output_tokens[0]


def test_disaggregated_matches_plain_greedy(setup):
    """The strongest check: transferred KV must continue the sequence
    bit-identically to a single-engine run."""
    params, cfg, ecfg = setup
    prompt = [5, 17, 42, 7, 9, 11, 13]
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    expected = Engine(params, cfg, ecfg).generate(prompt, sp).output_tokens

    coord = setup_disaggregated(params, cfg, ecfg)
    got = coord.generate(list(prompt), sp)
    assert got.output_tokens == expected
    assert got.finish_reason in ("stop", "length")


def test_disaggregated_concurrent_requests(setup):
    params, cfg, ecfg = setup
    coord = setup_disaggregated(params, cfg, ecfg)
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    prompts = [[3 + i, 7, 11, 2] for i in range(4)]
    sids = [coord.add_request(p, sp) for p in prompts]
    guard = 0
    while len(coord._results) < 4 and guard < 200:
        coord.process_prefills_sync()
        coord.step()
        guard += 1
    assert len(coord._results) == 4
    stats = coord.get_stats()
    assert stats["prefills_done"] == 4
    # expected outputs match independent plain runs
    eng = Engine(params, cfg, ecfg)
    for p, sid in zip(prompts, sids):
        want = eng.generate(p, sp).output_tokens
        assert coord._results[sid].output_tokens == want


def test_disaggregated_threaded_prefill(setup):
    params, cfg, ecfg = setup
    coord = setup_disaggregated(params, cfg, ecfg)
    coord.start()
    try:
        sp = SamplingParams(temperature=0.0, max_tokens=4)
        sid = coord.add_request([5, 17, 42], sp)
        guard = 0
        import time

        while sid not in coord._results and guard < 400:
            coord.step()
            time.sleep(0.01)
            guard += 1
        assert sid in coord._results
    finally:
        coord.stop()


def test_decode_worker_rejects_when_full(setup):
    params, cfg, ecfg = setup
    import dataclasses

    small = dataclasses.replace(ecfg, max_kv_blocks=4)
    pw = PrefillWorker(params, cfg, ecfg)
    dw = DecodeWorker(params, cfg, small)
    pr1 = pw.run_prefill(list(range(3, 12)),  # 9 tokens -> 3 blocks (+1 grow)
                         SamplingParams(temperature=0.0, max_tokens=4))
    rid1 = dw.receive_and_add_request(pr1)
    assert rid1 is not None
    pr2 = pw.run_prefill(list(range(5, 14)),
                         SamplingParams(temperature=0.0, max_tokens=4))
    assert dw.receive_and_add_request(pr2) is None  # no room
