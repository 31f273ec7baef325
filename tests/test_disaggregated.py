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
    assert pr.num_blocks == 2  # ceil(5/4)
    # KV stays on device end-to-end: export is a device gather, not numpy
    import jax as _jax

    assert isinstance(pr.kv_k, _jax.Array)
    assert pr.kv_k.shape[0] == cfg.num_hidden_layers
    assert pr.kv_k.shape[1] == 2
    assert float(np.abs(np.asarray(pr.kv_k)).sum()) > 0  # real KV content


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


def test_disjoint_device_groups_bit_exact(setup):
    """Prefill on devices[0:4], decode on devices[4:8]: the KV crosses the
    group boundary device-to-device and the continuation is bit-exact vs a
    single-engine run (VERDICT r1 item 3)."""
    from vllm_i64_tpu.parallel.mesh import ParallelConfig, make_mesh

    params, cfg, ecfg = setup
    devs = jax.devices()
    assert len(devs) >= 8
    prefill_mesh = make_mesh(ParallelConfig(dp=1, ep=1, tp=2), devices=devs[:4])
    decode_mesh = make_mesh(ParallelConfig(dp=1, ep=1, tp=2), devices=devs[4:8])

    prompt = [5, 17, 42, 7, 9, 11, 13, 21]
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    expected = Engine(params, cfg, ecfg).generate(prompt, sp).output_tokens

    coord = setup_disaggregated(
        params, cfg, ecfg, prefill_mesh=prefill_mesh, decode_mesh=decode_mesh)
    # the two runners really live on disjoint device sets
    p_devs = {d for d in coord.prefill.runner.kv_k.devices()}
    d_devs = {d for d in coord.decode.engine.runner.kv_k.devices()}
    assert p_devs.isdisjoint(d_devs)
    got = coord.generate(list(prompt), sp)
    assert got.output_tokens == expected


def test_pipelined_prefill_batch(setup):
    """Several prompts prefill in ONE dispatch on disjoint scratch ranges;
    every continuation matches the single-engine run."""
    params, cfg, ecfg = setup
    pw = PrefillWorker(params, cfg, ecfg)
    assert pw.max_inflight > 1
    sp = SamplingParams(temperature=0.0, max_tokens=1)
    prompts = [[3, 7, 11, 2], [5, 17, 42, 7, 9], [8, 1, 30]]
    prs = pw.run_prefill_batch([list(p) for p in prompts], [sp] * 3)
    for p, pr in zip(prompts, prs):
        expected = Engine(params, cfg, ecfg).generate(
            p, SamplingParams(temperature=0.0, max_tokens=1)).output_tokens
        assert pr.first_token == expected[0]
    # slots all returned
    assert pw._free_slots.qsize() == pw.max_inflight
