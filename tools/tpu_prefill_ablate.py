#!/usr/bin/env python
"""Itemize chunked-prefill step costs on the real chip by ablation.

Times the production prefill step program (flagship model, int8 W8A8,
fused norm+quant, flash/gather attention) at the longctx serving shapes —
a (B, T) chunk of long prompts with the paged cache holding the earlier
chunks — with individual components replaced by cheap stand-ins, each in a
fresh ModelRunner so the program recompiles. The difference vs the full
program is that component's share of the dispatch.

Prints one JSON line per variant: {"variant": ..., "ms_per_dispatch": ...}.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=512, help="tokens per row")
    ap.add_argument("--ctx", type=int, default=2048,
                    help="total context after this chunk (chunk start = "
                         "ctx - chunk)")
    ap.add_argument("--dispatches", type=int, default=8)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
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
    print("[ablate] params ready", file=_sys.stderr, flush=True)

    b, t, bs = args.batch, args.chunk, args.block_size
    ctx = args.ctx
    start = ctx - t
    assert start >= 0 and start % bs == 0 and t % bs == 0
    blocks_per_seq = -(-ctx // bs)
    nb = b * blocks_per_seq + 2

    ecfg = EngineConfig(
        max_batch_size=b,
        max_seq_len=max(256, ctx + bs),
        max_kv_blocks=nb,
        kv_block_size=bs,
        quantization="int8",
        decode_batch_buckets=(b,),
        prefill_batch_buckets=(b,),
        prefill_token_buckets=(t,),
        w8a8=True,
        fused_norm_quant=True,
        fuse_shared_expert=True,
        decode_chaining=False,
    )

    rng = np.random.default_rng(0)
    block_tables = np.arange(
        2, 2 + b * blocks_per_seq, dtype=np.int32).reshape(b, blocks_per_seq)
    ctx_lens = np.full(b, ctx, np.int32)
    positions = np.broadcast_to(
        start + np.arange(t, dtype=np.int32)[None], (b, t)).copy()
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
        suppress_step0=np.full(b, -1, np.int32),
        eos_ids=np.full(b, -1, np.int32),
        min_tokens=np.zeros(b, np.int32),
    )
    features = SamplerFeatures()

    def run_variant(name):
        r = runner_mod.ModelRunner(params, cfg, ecfg)
        t0 = time.perf_counter()

        def one():
            toks = rng.integers(3, cfg.vocab_size, size=(b, t)).astype(
                np.int64)
            return r.execute(
                toks, positions, block_tables, ctx_lens, last_idx, valid,
                slot_ids, sample_mask, sample_args, features,
                kind="prefill")

        one()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.dispatches):
            one()
        ms = (time.perf_counter() - t0) / args.dispatches * 1000
        print(json.dumps({
            "variant": name, "ms_per_dispatch": round(ms, 2),
            "tokens_per_dispatch": b * t,
            "tok_per_s": round(b * t / ms * 1000),
            "compile_s": round(compile_s, 1)}), flush=True)
        del r
        return ms

    real_attn = attn_ops.paged_attention
    real_write = attn_ops.write_kv
    real_moe = cdm.token_routed_mlp
    real_lm = cdm.lm_logits

    def fake_attn(q, k_cache, v_cache, block_tables, positions, ctx_lens,
                  *, scale=None, sliding_window=None, integer_softmax=False):
        return q * 0.99

    def fake_write(k_cache, v_cache, k, v, block_tables, positions,
                   valid=None, *, block_aligned=False):
        return k_cache, v_cache

    def fake_moe(x, token_ids, **kw):
        if hasattr(x, "to_float"):
            return x.to_float()
        return x

    def fake_lm(params_, cfg_, hidden):
        w = params_.get("lm_head_t", params_.get("embed"))
        wq = w.q if hasattr(w, "q") else w
        if wq.shape[0] != hidden.shape[-1]:
            wq = wq.T
        out = jnp.dot(hidden.astype(jnp.float32),
                      wq[:, :128].astype(jnp.float32))
        return jnp.pad(out, ((0, 0), (0, cfg_.vocab_size - 128)),
                       constant_values=-1e9)

    variants = {}

    def register(name, patches):
        variants[name] = patches

    register("full", {})
    register("no_attn", {(attn_ops, "paged_attention"): fake_attn,
                         (cdm, "paged_attention"): fake_attn})
    register("no_kv_write", {(attn_ops, "write_kv"): fake_write,
                             (cdm, "write_kv"): fake_write})
    register("no_moe", {(cdm, "token_routed_mlp"): fake_moe})
    register("no_lm_head", {(cdm, "lm_logits"): fake_lm})
    register("gemms_only",
             {(attn_ops, "paged_attention"): fake_attn,
              (cdm, "paged_attention"): fake_attn,
              (attn_ops, "write_kv"): fake_write,
              (cdm, "write_kv"): fake_write,
              (cdm, "token_routed_mlp"): fake_moe,
              (cdm, "lm_logits"): fake_lm})

    chosen = [v for v in args.variants.split(",") if v] or list(variants)
    for name in chosen:
        patches = variants[name]
        saved = {}
        try:
            for (mod, attr), repl in patches.items():
                saved[(mod, attr)] = getattr(mod, attr)
                setattr(mod, attr, repl)
            run_variant(name)
        finally:
            for (mod, attr), orig in saved.items():
                setattr(mod, attr, orig)


if __name__ == "__main__":
    main()
