#!/usr/bin/env python
"""Itemize prefill costs on the real chip by ablation.

Times the production prefill step program (flagship model, int8 W8A8,
bench shape: 16 rows x 128 tokens = 2048 tokens/dispatch) with individual
components replaced by cheap stand-ins, each in a fresh ModelRunner so the
program recompiles. The difference vs the full program is that component's
share of the dispatch. Prefill measured at ~25 TFLOP/s (12% of v5e peak)
in the round-2 profile — this tool says where the other 88% goes.

Prints one JSON line per variant:
  {"variant": ..., "ms_per_dispatch": ..., "tflops": ...}
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16)
    ap.add_argument("--tokens", type=int, default=128, help="tokens per row")
    ap.add_argument("--dispatches", type=int, default=8, help="timed dispatches")
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-w8a8", action="store_true")
    ap.add_argument("--pipeline", action="store_true",
                    help="defer host readbacks and resolve once at the end "
                         "(device-time measurement; the default per-dispatch "
                         "readback includes the ~40 ms tunnel round trip)")
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.core.quantize_model import (
        fuse_gate_up_params,
        fuse_qkv_params,
        fuse_shared_expert_params,
        materialize_lm_head,
        quantize_params,
    )
    from vllm_i64_tpu.core.sampling import SamplerFeatures
    from vllm_i64_tpu.engine import runner as runner_mod
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.models.presets import get_preset
    from vllm_i64_tpu.ops import attention as attn_ops

    cfg = get_preset("tr-hash-moe-500m")
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    params = cdm.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    params = quantize_params(params, cfg, "int8")
    params = fuse_qkv_params(params)
    params = fuse_shared_expert_params(params, cfg)
    params = fuse_gate_up_params(params)
    params = materialize_lm_head(params, cfg)
    params = jax.tree_util.tree_map(jax.device_put, params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    n_params = cdm.num_parameters(params)
    print(f"[ablate] params ready ({n_params/1e6:.1f}M)",
          file=_sys.stderr, flush=True)

    b, t, bs = args.rows, args.tokens, args.block_size
    blocks_per_seq = -(-t // bs) + 1
    nb = b * blocks_per_seq + 2

    ecfg = EngineConfig(
        max_batch_size=b,
        max_seq_len=max(256, 2 * t),
        max_kv_blocks=nb,
        kv_block_size=bs,
        quantization="int8",
        decode_batch_buckets=(b,),
        prefill_batch_buckets=(b,),
        prefill_token_buckets=(t,),
        w8a8=not args.no_w8a8,
        fused_norm_quant=not args.no_w8a8,
        fuse_shared_expert=True,
    )

    rng = np.random.default_rng(0)
    block_tables = np.arange(2, 2 + b * blocks_per_seq, dtype=np.int32).reshape(
        b, blocks_per_seq)
    positions = np.tile(np.arange(t, dtype=np.int32)[None], (b, 1))
    ctx_lens = np.full(b, t, np.int32)
    last_idx = np.full(b, t - 1, np.int32)
    valid = np.ones((b, t), bool)
    slot_ids = np.arange(b, dtype=np.int32)
    sample_mask = np.ones(b, bool)
    sample_args = dict(
        temperature=np.zeros(b, np.float32),
        top_k=np.zeros(b, np.int32),
        top_p=np.ones(b, np.float32),
        min_p=np.zeros(b, np.float32),
        typical_p=np.ones(b, np.float32),
        rep_pen=np.ones(b, np.float32),
        freq_pen=np.zeros(b, np.float32),
        pres_pen=np.zeros(b, np.float32),
        seeds=np.zeros(b, np.int32),
        gen_index=np.zeros(b, np.int32),
        eos_suppress=np.zeros(b, bool),
        eos_ids=np.full(b, -1, np.int32),
        min_tokens=np.zeros(b, np.int32),
    )
    features = SamplerFeatures()
    # FLOPs of the dense path: ~2 * active params * tokens (routed top-k
    # experts + shared fold counted once — good enough for a % readout)
    flops = 2.0 * n_params * b * t

    def run_variant(name):
        r = runner_mod.ModelRunner(params, cfg, ecfg)
        t0 = time.perf_counter()

        def dispatch(defer=False):
            toks = rng.integers(3, cfg.vocab_size, size=(b, t)).astype(np.int64)
            out, _ = r.execute(
                toks, positions, block_tables, ctx_lens, last_idx, valid,
                slot_ids, sample_mask, sample_args, features,
                kind="prefill", defer=defer)
            return out

        dispatch()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        if args.pipeline:
            outs = [dispatch(defer=True) for _ in range(args.dispatches)]
            np.asarray(outs[-1])
        else:
            for _ in range(args.dispatches):
                dispatch()
        ms = (time.perf_counter() - t0) / args.dispatches * 1000
        print(json.dumps({"variant": name,
                          "ms_per_dispatch": round(ms, 3),
                          "tflops": round(flops / (ms / 1000) / 1e12, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
        del r
        return ms

    # --- stand-ins ----------------------------------------------------------
    def fake_attn(q, k_cache, v_cache, block_tables_, positions_, ctx_lens_,
                  **kw):
        # cheap dep on the cache so the KV write isn't reordered away
        return q + (v_cache[0, 0, 0, 0] * 0).astype(q.dtype)

    def fake_write_kv(k_cache, v_cache, k, v, block_tables_, positions_,
                      valid_=None, **kw):
        # keep the QKV GEMM alive with a 1-element dep, skip the scatter
        k_cache = k_cache.at[0, 0, 0, 0].add(k[0, 0, 0, 0].astype(k_cache.dtype))
        v_cache = v_cache.at[0, 0, 0, 0].add(v[0, 0, 0, 0].astype(v_cache.dtype))
        return k_cache, v_cache

    def fake_lm(params_, cfg_, hidden):
        w = params_.get("lm_head_t", params_.get("embed"))
        wq = w.q if hasattr(w, "q") else w
        if wq.shape[0] != hidden.shape[-1]:
            wq = wq.T
        out = jnp.dot(hidden.astype(jnp.float32),
                      wq[:, :128].astype(jnp.float32))
        return jnp.pad(out, ((0, 0), (0, cfg_.vocab_size - 128)),
                       constant_values=-1e9)

    def fake_sampler(logits, *, features, key, counts=None, **kw):
        return jnp.argmax(logits[:, :128], axis=-1).astype(jnp.int32)

    def fake_moe(x, token_ids, **kw):
        # x may be a PreQuantActs marker (fused norm+quant) — return floats
        return x.to_float() if hasattr(x, "to_float") else x

    variants = {
        "full": {},
        "no_attn": {(attn_ops, "paged_attention"): fake_attn,
                    (cdm, "paged_attention"): fake_attn},
        "no_write_kv": {(attn_ops, "write_kv"): fake_write_kv,
                        (cdm, "write_kv"): fake_write_kv},
        "no_moe": {(cdm, "token_routed_mlp"): fake_moe},
        "no_lm_head": {(cdm, "lm_logits"): fake_lm},
        "no_sampler": {(runner_mod, "sample_tokens"): fake_sampler},
        "gemms_only": {(attn_ops, "paged_attention"): fake_attn,
                       (cdm, "paged_attention"): fake_attn,
                       (attn_ops, "write_kv"): fake_write_kv,
                       (cdm, "write_kv"): fake_write_kv,
                       (cdm, "lm_logits"): fake_lm,
                       (runner_mod, "sample_tokens"): fake_sampler},
    }

    chosen = ([v.strip() for v in args.variants.split(",") if v.strip()]
              or list(variants))
    for name in chosen:
        patches = variants[name]
        saved = {}
        for (mod, attr), fn in patches.items():
            saved[(mod, attr)] = getattr(mod, attr)
            setattr(mod, attr, fn)
        try:
            run_variant(name)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name,
                              "error": repr(e)[:200]}), flush=True)
        finally:
            for (mod, attr), fn in saved.items():
                setattr(mod, attr, saved[(mod, attr)])


if __name__ == "__main__":
    main()
