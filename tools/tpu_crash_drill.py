#!/usr/bin/env python
"""Crash-recovery drill on the real TPU (ROADMAP hardening #11).

Exercises the async engine's recovery path (engine/async_engine.py:192-228,
ref: i64_engine.py:1496-1523) against REAL device state: a step failure
mid-flight must fail the affected requests' futures, leave the paged cache
and slot maps consistent, and let subsequent requests complete correctly.

Drills:
1. transient step exceptions (2 in a row) -> affected requests fail, the
   loop continues, new requests generate token-exact vs an unfailed run
2. failure while a decode chain is in flight -> chain state is discarded
   cleanly, engine keeps serving

Usage: python tools/tpu_crash_drill.py   (runs on CPU too, but the point
is the device-state consistency on the chip). Exit 0 = drill passed.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import asyncio
import sys
import time

import numpy as np

import jax


def main() -> int:
    from vllm_i64_tpu.config import EngineConfig, ModelConfig
    from vllm_i64_tpu.core.sampling import SamplingParams
    from vllm_i64_tpu.engine import AsyncEngine, Engine
    from vllm_i64_tpu.models import complexity_deep as cdm

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    cfg = ModelConfig(
        vocab_size=1024, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, num_experts=4, top_k=2,
        shared_expert=True)
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(
        max_batch_size=8, max_seq_len=128, kv_block_size=16,
        max_kv_blocks=128, max_prefill_tokens=64,
        decode_batch_buckets=(2, 4, 8), prefill_batch_buckets=(2, 4, 8),
        prefill_token_buckets=(16, 32, 64), multistep_decode=4,
    )
    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, 1024, 12).tolist() for _ in range(6)]
    sp = SamplingParams(temperature=0.0, max_tokens=10)

    # reference run (no failures) for token-exact comparison
    ref_engine = Engine(params, cfg, ecfg)
    ref = [ref_engine.generate(p, sp).output_tokens for p in prompts]

    async def drill() -> int:
        engine = Engine(params, cfg, ecfg)
        aeng = AsyncEngine(engine)
        await aeng.start()

        # 1) transient step failures mid-flight
        real_step = engine.step
        fail_box = {"n": 0}

        def flaky_step():
            if 0 < fail_box["n"]:
                fail_box["n"] -= 1
                raise RuntimeError("injected device failure")
            return real_step()

        engine.step = flaky_step
        t1 = asyncio.ensure_future(aeng.generate(prompts[0], sp))
        t2 = asyncio.ensure_future(aeng.generate(prompts[1], sp))
        await asyncio.sleep(0.05)
        fail_box["n"] = 2  # next two steps blow up
        failed = 0
        for t in (t1, t2):
            try:
                await t
            except Exception:
                failed += 1
        print(f"drill 1: {failed} request(s) failed on injected errors "
              f"(engine kept running)", flush=True)

        # engine must still serve correctly after the failures
        outs = await asyncio.gather(
            *[aeng.generate(p, sp) for p in prompts[2:]])
        got = [o.output_tokens for o in outs]
        assert got == ref[2:], f"post-failure outputs diverge: {got}"
        print("drill 1: post-failure generations token-exact vs clean run",
              flush=True)

        # 2) failure while a decode chain is active
        fail_box["n"] = 0
        orig_advance = engine._chain_advance
        chain_box = {"armed": True}

        def flaky_advance():
            if chain_box["armed"] and engine._decode_chain is not None:
                chain_box["armed"] = False
                engine._decode_chain = None  # drop the in-flight window
                raise RuntimeError("injected failure mid-chain")
            return orig_advance()

        engine._chain_advance = flaky_advance
        t3 = asyncio.ensure_future(aeng.generate(prompts[0], sp))
        try:
            await t3
            print("drill 2: request survived mid-chain failure", flush=True)
        except Exception:
            print("drill 2: request failed cleanly on mid-chain failure",
                  flush=True)
        engine._chain_advance = orig_advance

        out = await aeng.generate(prompts[1], sp)
        assert out.output_tokens == ref[1], "post-chain-failure output diverges"
        print("drill 2: engine serves token-exact after chain failure",
              flush=True)

        st = aeng.get_stats()
        assert st["pending"] == 0 and st["running"] == 0
        await aeng.stop()
        return 0

    t0 = time.perf_counter()
    rc = asyncio.run(drill())
    print(f"CRASH DRILL OK ({time.perf_counter() - t0:.1f}s)", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
