#!/usr/bin/env python
"""Itemize decode-window costs on the real chip by ablation.

Times the production 16-iteration multistep decode window (flagship model,
int8 W8A8, batch 64) with individual components replaced by cheap stand-ins,
each in a fresh ModelRunner so the program recompiles. The difference vs the
full program is that component's share of the iteration. Also measures the
weight-streaming floor (one forced HBM read of every weight byte per
iteration) — the speed-of-light bound for batch-small decode.

Prints one JSON line per variant: {"variant": ..., "ms_per_iter": ...}.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=128)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--windows", type=int, default=8, help="timed windows")
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--kv-dtype", default="bfloat16",
                    help="KV cache dtype (e.g. float8_e4m3fn halves "
                         "gather bytes at long context)")
    ap.add_argument("--quantization", default="int8",
                    choices=("int8", "int4"),
                    help="weight path to itemize (int4 = W4A8 fused "
                         "in-kernel-dequant Pallas kernels)")
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
    # mirror the ENGINE's exact param-prep order (engine/engine.py:149-185):
    # float fusions -> quantize -> int4 serving repack -> gate_up fusion
    # (a no-op for int4: gate/up stay separate Q4 tensors) -> lm head.
    # An earlier version fused gate_up BEFORE quantize_params, which left
    # the fused (L, H, 2I) weight bf16 (503 MB!) and invalidated every
    # int4 "in-engine" number this tool produced.
    from vllm_i64_tpu.core.quantize_model import repack_int4_serving

    params = fuse_qkv_params(params)
    params = fuse_shared_expert_params(params, cfg)
    params = quantize_params(params, cfg, args.quantization)
    params = repack_int4_serving(params)
    params = fuse_gate_up_params(params)
    params = materialize_lm_head(params, cfg)
    params = jax.tree_util.tree_map(jax.device_put, params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    print("[ablate] params ready", file=_sys.stderr, flush=True)

    b, bs, k_steps = args.batch, args.block_size, args.steps
    blocks_per_seq = -(-(args.ctx + 2 * k_steps + bs) // bs)
    nb = b * blocks_per_seq + 2

    ecfg = EngineConfig(
        max_batch_size=b,
        max_seq_len=max(256, args.ctx + 4 * k_steps),
        max_kv_blocks=nb,
        kv_block_size=bs,
        quantization=args.quantization,
        kv_cache_dtype=args.kv_dtype,
        decode_batch_buckets=(b,),
        prefill_batch_buckets=(1,),
        prefill_token_buckets=(128,),
        multistep_decode=k_steps,
        w8a8=True,
        fused_norm_quant=True,
        fuse_shared_expert=True,
        decode_chaining=False,
    )

    rng = np.random.default_rng(0)
    block_tables = np.arange(2, 2 + b * blocks_per_seq, dtype=np.int32).reshape(
        b, blocks_per_seq)
    ctx_lens = np.full(b, args.ctx, np.int32)
    positions = np.full(b, args.ctx - 1, np.int32)
    slot_ids = np.arange(b, dtype=np.int32)
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
        suppress_step0=np.full(b, -1, np.int32),
        eos_ids=np.full(b, -1, np.int32),  # never hit EOS
        min_tokens=np.zeros(b, np.int32),
    )
    # match the engine-bench workload's compiled program: plain greedy
    # batches run the argmax-only all_greedy sampler program
    features = SamplerFeatures(all_greedy=True)

    def run_variant(name):
        r = runner_mod.ModelRunner(params, cfg, ecfg)
        # warmup/compile
        t0 = time.perf_counter()
        toks = rng.integers(3, cfg.vocab_size, size=b).astype(np.int64)
        out = r.execute_multi_decode(
            toks, positions, block_tables, ctx_lens, slot_ids,
            np.full(b, 10**6, np.int32), sample_args, features, k_steps)
        compile_s = time.perf_counter() - t0
        # timed: vary tokens per dispatch (the tunnel memoizes identical calls)
        t0 = time.perf_counter()
        for i in range(args.windows):
            toks = rng.integers(3, cfg.vocab_size, size=b).astype(np.int64)
            out = r.execute_multi_decode(
                toks, positions, block_tables, ctx_lens, slot_ids,
                np.full(b, 10**6, np.int32), sample_args, features, k_steps)
        ms = (time.perf_counter() - t0) / (args.windows * k_steps) * 1000
        print(json.dumps({"variant": name,
                          "ms_per_iter": round(ms, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)
        del r
        return ms

    # --- stand-ins ----------------------------------------------------------
    real_window_attn = attn_ops.paged_attention_window
    real_lm = cdm.lm_logits
    real_sampler = runner_mod.sample_tokens
    real_moe = cdm.token_routed_mlp
    real_merge = attn_ops.merge_window_kv
    real_gather = attn_ops.gather_kv

    def fake_window_attn(q, k_cache, v_cache, block_tables, ctx0,
                         win_k, win_v, k_idx, *, scale=None,
                         integer_softmax=False):
        # keep a dependence on the window buffers so nothing upstream is DCE'd
        return q + jnp.mean(win_v).astype(q.dtype)

    def hist_only_attn(q, k_cache, v_cache, block_tables, ctx0,
                       win_k, win_v, k_idx, *, scale=None,
                       integer_softmax=False):
        # history gather + softmax only; window in-band einsums removed
        out = attn_ops.paged_attention(
            q, k_cache, v_cache, block_tables,
            jnp.maximum(ctx0 - 1, 0)[:, None], ctx0, scale=scale)
        return out + jnp.mean(win_v).astype(q.dtype) * 0

    def fake_lm(params_, cfg_, hidden):
        # cheap: project to 128 logits, pad to vocab (keeps data dependence)
        w = params_.get("lm_head_t", params_.get("embed"))
        wq = w.q if hasattr(w, "q") else w
        if wq.shape[0] != hidden.shape[-1]:
            wq = wq.T  # untransposed tied embedding
        out = jnp.dot(hidden.astype(jnp.float32),
                      wq[:, :128].astype(jnp.float32))
        return jnp.pad(out, ((0, 0), (0, cfg_.vocab_size - 128)),
                       constant_values=-1e9)

    def fake_sampler(logits, *, features, key, counts=None, **kw):
        return jnp.argmax(logits[:, :128], axis=-1).astype(jnp.int32)

    def fake_moe(x, token_ids, **kw):
        # x may be a PreQuantActs marker (fused norm+quant feeding W8A8
        # GEMMs); the residual add downstream needs a float array
        if hasattr(x, "to_float"):
            return x.to_float()
        return x

    def fake_merge(k_cache, v_cache, win_k, win_v, block_tables, ctx0,
                   steps_taken):
        return k_cache, v_cache

    variants = {}

    def register(name, patches):
        variants[name] = patches

    register("full", {})
    register("no_merge", {(attn_ops, "merge_window_kv"): fake_merge})
    register("no_window_attn",
             {(attn_ops, "paged_attention_window"): fake_window_attn,
              (cdm, "paged_attention_window"): fake_window_attn})
    register("hist_only_attn",
             {(attn_ops, "paged_attention_window"): hist_only_attn,
              (cdm, "paged_attention_window"): hist_only_attn})
    register("no_lm_head", {(cdm, "lm_logits"): fake_lm})
    register("no_sampler", {(runner_mod, "sample_tokens"): fake_sampler})
    register("no_moe", {(cdm, "token_routed_mlp"): fake_moe})
    register("gemms_only",
             {(attn_ops, "paged_attention_window"): fake_window_attn,
              (cdm, "paged_attention_window"): fake_window_attn,
              (cdm, "lm_logits"): fake_lm,
              (runner_mod, "sample_tokens"): fake_sampler,
              (attn_ops, "merge_window_kv"): fake_merge})

    chosen = ([v.strip() for v in args.variants.split(",") if v.strip()]
              or list(variants))
    results = {}
    for name in chosen:
        patches = variants[name]
        saved = {}
        for (mod, attr), fn in patches.items():
            saved[(mod, attr)] = getattr(mod, attr)
            setattr(mod, attr, fn)
        try:
            results[name] = run_variant(name)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name,
                              "error": repr(e)[:200]}), flush=True)
        finally:
            for (mod, attr), fn in saved.items():
                setattr(mod, attr, fn)

    # --- weight-streaming floor ---------------------------------------------
    leaves = [x for x in jax.tree_util.tree_leaves(params)
              if hasattr(x, "nbytes") and x.nbytes > 1 << 16]
    total_bytes = sum(x.nbytes for x in leaves)

    def stream_once(c, ws):
        # c-dependent elementwise op per leaf forces a full HBM re-read
        # every iteration (a plain sum would be hoisted as loop-invariant)
        acc = jnp.float32(0)
        for wl in ws:
            acc = acc + jnp.sum((wl + c.astype(wl.dtype)).astype(jnp.float32)
                                if wl.dtype == jnp.int8
                                else (wl * (1 + c.astype(wl.dtype))
                                      ).astype(jnp.float32))
        return acc

    @jax.jit
    def stream_scan(ws, seed):
        def body(c, i):
            return (stream_once((c + i) % 3, ws) * 0).astype(c.dtype) + c + 1, None
        c, _ = jax.lax.scan(body, seed, jnp.arange(k_steps, dtype=jnp.int32))
        return c

    np.asarray(stream_scan(leaves, jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(args.windows):
        np.asarray(stream_scan(leaves, jnp.int32(i)))
    ms = (time.perf_counter() - t0) / (args.windows * k_steps) * 1000
    print(json.dumps({"variant": "weight_stream_floor",
                      "ms_per_iter": round(ms, 3),
                      "weight_mb": round(total_bytes / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
