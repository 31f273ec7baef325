"""vllm-i64-tpu CLI: serve / list / check / bench / agent / estimate
(ref: vllm_i64/cli.py:466-607).

TPU-first differences from the reference CLI:
- parallelism is a device-mesh spec (--dp/--ep/--tp) compiled by GSPMD, not
  a torchrun process launcher (ref launches torchrun at cli.py:59-95)
- --platform cpu|tpu selects the JAX backend (CPU for tests/dev)
- estimate speaks TPU HBM sizes (v5e/v5p/v4), not GPU VRAM
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

logger = logging.getLogger("vllm_i64_tpu.cli")


def _setup_logging(json_logs: bool = False) -> None:
    from .core.logging import setup_logging

    setup_logging(json_logs=json_logs)


def _select_platform(platform: str) -> None:
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


# ---------------------------------------------------------------------------
# serve
# ---------------------------------------------------------------------------


def cmd_serve(args) -> None:
    _setup_logging(args.log_json)
    _select_platform(args.platform)

    import jax
    import jax.numpy as jnp

    if args.compilation_cache:
        # persistent XLA compilation cache (the TPU analog of the
        # reference's --compile knob, ref: core/compile.py + cli.py:151-158
        # — there it opts INTO compilation; here everything is always jit
        # compiled, so the knob instead makes compilations survive process
        # restarts: bucketed step programs cost 20-40s each to build)
        jax.config.update("jax_compilation_cache_dir",
                          args.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logger.info("persistent compilation cache: %s",
                    args.compilation_cache)

    from .api import Server
    from .config import EngineConfig, ModelConfig
    from .core.chat_template import ChatTemplate, load_chat_template
    from .core.tokenizer import load_tokenizer_or_fallback
    from .engine import Engine

    if args.dtype == "float16":
        # TPU matmul units have no fp16 path worth using; serve in bf16 —
        # LOUDLY, and make the KV cache follow the substituted dtype so
        # weights and cache agree
        logger.warning("--dtype float16 is served as bfloat16 on TPU "
                       "(no efficient fp16 path); KV cache follows")
        args.dtype = "bfloat16"
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]

    params = None
    model_cfg = None
    tokenizer = None
    chat_template = None
    model_name = args.model or "no-model"

    if args.model and not args.no_model:
        from .core.loader import load_model, load_model_by_name, resolve_checkpoint_source

        t0 = time.perf_counter()
        if args.checkpoint:
            params, model_cfg, stats = load_model(args.checkpoint, dtype=dtype)
            source = args.checkpoint
        else:
            params, model_cfg, stats = load_model_by_name(args.model, dtype=dtype)
            from .models.registry import get_model_entry

            source = resolve_checkpoint_source(get_model_entry(args.model).checkpoint)
        logger.info("loaded %d tensors in %.1fs", stats["loaded"],
                    time.perf_counter() - t0)
        if args.quantization in ("int8", "int4", "fp8"):
            # quantization happens inside Engine init AFTER the float weight
            # fusions (fuse_qkv / fuse_shared_expert) so fused weights
            # quantize as single tensors and int4 dims stay 128-aligned for
            # the fused Pallas kernels (ops/int4_matmul.py)
            logger.info("weights will quantize to %s at engine init",
                        args.quantization)
        tokenizer = load_tokenizer_or_fallback(source)
        chat_template = (ChatTemplate.from_file(args.chat_template)
                         if args.chat_template else load_chat_template(source))
    elif args.no_model:
        model_cfg = ModelConfig()
        from .core.tokenizer import ByteTokenizer

        tokenizer = ByteTokenizer()
        chat_template = ChatTemplate.default()
    else:
        print("error: specify a model or --no-model", file=sys.stderr)
        sys.exit(1)

    block_size = args.block_size or (
        128 if jax.default_backend() not in ("cpu",) else 16)
    ecfg = EngineConfig(
        max_batch_size=args.max_batch_size,
        max_seq_len=args.max_seq_len,
        max_kv_blocks=args.max_kv_blocks,
        kv_block_size=block_size,
        max_prefill_tokens=args.chunk_size,
        enable_prefix_caching=not args.no_prefix_caching,
        dtype=args.dtype,
        kv_cache_dtype=args.kv_cache_dtype or args.dtype,
        quantization=args.quantization,
        # full perf surface (the bench path's configuration is constructible
        # from the CLI; ref flag surface: vllm_i64/cli.py:474-539)
        w8a8=args.w8a8 and args.quantization in ("int8", "int4", "awq",
                                                 "gptq"),
        fused_norm_quant=args.fused_norm_quant,
        multistep_decode=args.multistep,
        fuse_shared_expert=args.fuse_shared_expert,
        decode_chaining=args.decode_chaining,
        enable_kv_swap=args.enable_kv_swap,
        kv_swap_max_mb=args.kv_swap_max_mb,
        kv_fp8_auto=args.kv_fp8_auto,
    )

    if args.disaggregated:
        # disaggregated prefill/decode serving (ref: cli.py:61-78 +
        # launch_disaggregated, disaggregated.py:1145-1185): prefill and
        # decode workers on disjoint device groups when >=2 devices exist;
        # on one device both runners share it (functional, not faster)
        from .engine.async_disaggregated import AsyncDisaggregatedEngine
        from .parallel.disaggregated import setup_disaggregated

        devs = jax.devices()
        prefill_mesh = decode_mesh = None
        if len(devs) >= 2:
            from jax.sharding import Mesh

            n_pre = max(1, min(args.prefill_devices, len(devs) - 1))
            import numpy as _np

            prefill_mesh = Mesh(
                _np.array(devs[:n_pre]).reshape(1, 1, n_pre),
                ("dp", "ep", "tp"))
            decode_mesh = Mesh(
                _np.array(devs[n_pre:]).reshape(1, 1, len(devs) - n_pre),
                ("dp", "ep", "tp"))
            logger.info("disaggregated: prefill on %d device(s), decode on "
                        "%d device(s)", n_pre, len(devs) - n_pre)
        else:
            logger.warning("disaggregated mode on a single device: prefill "
                           "and decode workers share the chip")
        coordinator = setup_disaggregated(
            params, model_cfg, ecfg,
            prefill_mesh=prefill_mesh, decode_mesh=decode_mesh)
        Server(
            coordinator.decode.engine,
            tokenizer=tokenizer,
            chat_template=chat_template,
            model_name=model_name,
            host=args.host,
            port=args.port,
            api_key=args.api_key,
            rate_limit=args.rate_limit,
            max_pending=args.max_pending,
            metrics_port=args.metrics_port,
            async_engine=AsyncDisaggregatedEngine(coordinator),
        ).run()
        return

    mesh = None
    if args.dp * args.ep * args.tp > 1:
        from .parallel import ParallelConfig, make_mesh, shard_params, validate_divisibility

        pcfg = ParallelConfig(dp=args.dp, ep=args.ep, tp=args.tp)
        if model_cfg is not None:
            validate_divisibility(model_cfg, pcfg)
        mesh = make_mesh(pcfg)
        if params is not None:
            params = shard_params(params, model_cfg, mesh)
        logger.info("mesh: dp=%d ep=%d tp=%d", args.dp, args.ep, args.tp)

    if args.cross_host:
        # multi-host data-parallel serving: every host starts this same
        # command; init_distributed joins the runtime, host 0 becomes the
        # router + HTTP server, other hosts serve engine workers
        # (parallel/cross_host.py; ref role split: worker.py:97-121)
        from .parallel.cross_host import launch_cross_host
        from .parallel.launcher import init_distributed

        init_distributed()
        router = launch_cross_host(
            lambda: Engine(params, model_cfg, ecfg, tokenizer=tokenizer,
                           mesh=mesh))
        if router is None:
            return  # worker host served until the router shut it down
        Server(
            None,
            tokenizer=tokenizer,
            chat_template=chat_template,
            model_name=model_name,
            host=args.host,
            port=args.port,
            api_key=args.api_key,
            rate_limit=args.rate_limit,
            max_pending=args.max_pending,
            metrics_port=args.metrics_port,
            router=router,
        ).run()
        return

    engine = Engine(params, model_cfg, ecfg, tokenizer=tokenizer, mesh=mesh)

    do_warmup = args.warmup == "full" or (
        args.warmup == "auto" and jax.default_backend() != "cpu")
    if do_warmup and params is not None:
        t0 = time.perf_counter()
        n = engine.warmup(log=logger.debug)
        logger.info("warmup: %d step programs compiled in %.0fs "
                    "(no runtime compiles can stall serving traffic)",
                    n, time.perf_counter() - t0)

    retriever = None
    if args.rag_index:
        from .rag import Retriever

        retriever = Retriever.load_or_create(args.rag_index, engine=engine)
    sandbox = None
    if args.sandbox:
        from .sandbox import Sandbox

        sandbox = Sandbox(timeout_s=args.sandbox_timeout,
                          max_memory_mb=args.sandbox_memory,
                          user=args.sandbox_user)

    Server(
        engine,
        tokenizer=tokenizer,
        chat_template=chat_template,
        model_name=model_name,
        host=args.host,
        port=args.port,
        api_key=args.api_key,
        rate_limit=args.rate_limit,
        max_pending=args.max_pending,
        retriever=retriever,
        sandbox=sandbox,
        metrics_port=args.metrics_port,
    ).run()


# ---------------------------------------------------------------------------
# list / check
# ---------------------------------------------------------------------------


def cmd_list(args) -> None:
    from .models.registry import list_models

    print(f"{'NAME':<22} {'PARAMS':<9} DESCRIPTION")
    for e in list_models():
        print(f"{e.name:<22} {e.parameters:<9} {e.description}")


def cmd_check(args) -> None:
    from .core.loader import resolve_checkpoint_source
    from .models.registry import get_model_entry

    try:
        entry = get_model_entry(args.model)
    except KeyError as exc:
        print(f"error: {exc}", file=sys.stderr)
        sys.exit(1)
    print(f"model:      {entry.name}")
    print(f"checkpoint: {entry.checkpoint}")
    try:
        path = resolve_checkpoint_source(entry.checkpoint)
        print(f"resolved:   {path}")
        cfg = Path(path) / "config.json"
        print(f"config:     {'OK' if cfg.exists() else 'MISSING'}")
        tok = Path(path) / "tokenizer.json"
        print(f"tokenizer:  {'OK' if tok.exists() else 'MISSING'}")
        print("status:     available")
    except FileNotFoundError as exc:
        print(f"status:     unavailable ({exc})")
        sys.exit(1)


# ---------------------------------------------------------------------------
# bench
# ---------------------------------------------------------------------------


def cmd_bench(args) -> None:
    _select_platform(args.platform)
    if args.mode in ("routing", "all"):
        from .benchmarks.bench_routing import run_routing_bench

        run_routing_bench(num_experts=args.num_experts)
    if args.mode in ("engine", "all"):
        from .benchmarks.bench_engine import run_engine_bench

        run_engine_bench(
            model=args.model,
            requests=args.requests,
            prompt_len=args.prompt_len,
            output_len=args.output_len,
            quantization=args.quantization,
            tiny=args.tiny,
        )


# ---------------------------------------------------------------------------
# agent
# ---------------------------------------------------------------------------


def cmd_agent(args) -> None:
    from .agentics import Agent, Client

    client = Client(base_url=args.server, api_key=args.api_key)
    agent = Agent(
        client,
        allow_shell=args.allow_shell,
        max_steps=args.max_steps,
        temperature=args.temperature,
        max_tokens=args.max_tokens,
    )
    if args.task and not args.interactive:
        result = agent.run(" ".join(args.task))
        print(result)
        return
    print("interactive agent — empty line to exit")
    while True:
        try:
            task = input("agent> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not task:
            break
        print(agent.run(task))


# ---------------------------------------------------------------------------
# estimate
# ---------------------------------------------------------------------------

_DTYPE_BYTES = {"float32": 4, "bfloat16": 2, "float16": 2,
                "int8": 1, "fp8": 1, "int4": 0.5}

# (HBM GiB, chip name)
_TPU_SIZES = [(16, "v5e"), (32, "v4"), (95, "v5p"), (32, "v6e (Trillium)")]


def cmd_estimate(args) -> None:
    if args.checkpoint:
        cfg_path = Path(args.checkpoint) / "config.json"
        if not cfg_path.exists():
            print("error: config.json not found in --checkpoint", file=sys.stderr)
            sys.exit(1)
        with open(cfg_path, encoding="utf-8") as f:
            cfg = json.load(f)
    else:
        from .models.presets import get_preset

        try:
            import dataclasses

            cfg = dataclasses.asdict(get_preset(args.model))
        except KeyError:
            print(f"error: unknown model {args.model!r}; use --checkpoint",
                  file=sys.stderr)
            sys.exit(1)

    hidden = cfg.get("hidden_size", 1024)
    layers = cfg.get("num_hidden_layers", 20)
    heads = cfg.get("num_attention_heads", 16)
    kv_heads = cfg.get("num_key_value_heads", heads)
    vocab = cfg.get("vocab_size", 32000)
    inter = cfg.get("intermediate_size", hidden * 4)
    experts = max(1, cfg.get("num_experts", 1))
    shared = cfg.get("shared_expert", False)
    head_dim = hidden // heads

    wbytes = _DTYPE_BYTES.get(args.dtype, 2)
    kvbytes = _DTYPE_BYTES.get(args.kv_dtype or args.dtype, 2)

    embed = vocab * hidden  # tied embeddings
    attn = hidden * (heads * head_dim + 2 * kv_heads * head_dim) + heads * head_dim * hidden
    expert_inter = inter // experts
    mlp = experts * 3 * hidden * expert_inter
    if shared:
        mlp += 3 * hidden * expert_inter
    norms = 2 * hidden
    total_params = embed + layers * (attn + mlp + norms)

    weights_gb = total_params * wbytes / 1e9
    kv_per_tok = 2 * kv_heads * head_dim * kvbytes
    kv_gb = layers * args.max_batch_size * args.max_seq_len * kv_per_tok / 1e9
    act_gb = args.max_batch_size * args.max_seq_len * hidden * 4 / 1e9
    total = weights_gb + kv_gb + act_gb
    overhead = total * 0.1  # XLA compilation buffers etc.

    print(f"{'TPU Memory Estimate':=^50}")
    print(f"  layers={layers} hidden={hidden} heads={heads}/{kv_heads} "
          f"experts={experts} vocab={vocab:,}")
    print(f"  parameters: {total_params:,} (~{total_params/1e9:.2f}B), "
          f"dtype={args.dtype}")
    print(f"  {'weights':<22} {weights_gb:>8.2f} GB")
    print(f"  {'KV cache':<22} {kv_gb:>8.2f} GB "
          f"(batch={args.max_batch_size}, seq={args.max_seq_len})")
    print(f"  {'activations':<22} {act_gb:>8.2f} GB")
    print(f"  {'XLA overhead (~10%)':<22} {overhead:>8.2f} GB")
    print(f"  {'TOTAL':<22} {total + overhead:>8.2f} GB")
    required = total + overhead
    print("  fits on:")
    for size, name in _TPU_SIZES:
        ok = required <= size
        import math

        shards = max(1, math.ceil(required / size))
        note = "" if ok else f" (needs {shards} chips, tp/ep sharded)"
        print(f"    [{'OK' if ok else 'NO'}] {name} ({size} GB HBM){note}")


# ---------------------------------------------------------------------------


def main() -> None:
    parser = argparse.ArgumentParser(
        prog="vllm-i64-tpu",
        description="TPU-native integer-first inference engine for "
                    "token-routed models",
    )
    sub = parser.add_subparsers(dest="command")

    p = sub.add_parser("serve", help="Start the inference server")
    p.add_argument("model", nargs="?", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="JAX backend (default: auto)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float16", "bfloat16", "float32"])
    p.add_argument("--dp", type=int, default=1, help="data-parallel mesh axis")
    p.add_argument("--ep", type=int, default=1, help="expert-parallel mesh axis")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh axis")
    p.add_argument("--quantization", default="none",
                   choices=["int8", "int4", "fp8", "awq", "gptq", "none"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--chat-template", default=None)
    p.add_argument("--no-prefix-caching", action="store_true")
    p.add_argument("--kv-cache-dtype", default=None)
    p.add_argument("--max-kv-blocks", type=int, default=0)
    p.add_argument("--max-batch-size", type=int, default=32)
    p.add_argument("--max-seq-len", type=int, default=2048)
    p.add_argument("--chunk-size", type=int, default=512,
                   help="chunked prefill token budget")
    p.add_argument("--block-size", type=int, default=0,
                   help="KV cache block size in tokens; 0 = auto "
                        "(128 on TPU — the decode page gather is "
                        "slab-count-bound and 128 halves it vs 16 — "
                        "16 on CPU, matching the reference)")
    p.add_argument("--w8a8", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="dynamic int8 activations into native int8 MXU "
                        "matmuls for int8/int4 weights (the bench-default "
                        "fast path; --no-w8a8 for weight-only dequant)")
    p.add_argument("--fused-norm-quant",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="fuse rmsnorm + int8 activation quant into one "
                        "Pallas kernel feeding the W8A8 GEMMs (numerics "
                        "identical; +3.5%% on v5e)")
    p.add_argument("--multistep", type=int, default=16,
                   help="decode iterations fused per device dispatch "
                        "(1 = off)")
    p.add_argument("--fuse-shared-expert",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="fold the shared lexical expert into the "
                        "flat-expert MoE GEMMs")
    p.add_argument("--decode-chaining",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="pipeline consecutive multistep decode windows")
    p.add_argument("--enable-kv-swap", action="store_true",
                   help="preemption saves KV blocks to host memory and "
                        "restores them at re-admission (vs recompute)")
    p.add_argument("--kv-swap-max-mb", type=int, default=512)
    p.add_argument("--kv-fp8-auto", action="store_true",
                   help="auto-upgrade the KV cache to fp8 at 70%% block "
                        "usage")
    p.add_argument("--disaggregated", action="store_true",
                   help="disaggregated prefill/decode serving: prefill and "
                        "decode workers on disjoint device groups, KV "
                        "moves device-to-device")
    p.add_argument("--prefill-devices", type=int, default=1,
                   help="devices assigned to the prefill worker under "
                        "--disaggregated (rest decode)")
    p.add_argument("--compilation-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory — step "
                        "programs (20-40s compiles each) survive server "
                        "restarts (analog of the reference's --compile)")
    p.add_argument("--warmup", default="auto",
                   choices=["auto", "off", "full"],
                   help="precompile every bucketed step program before "
                        "serving (an uncompiled program hit mid-traffic "
                        "stalls all in-flight requests for the compile). "
                        "auto = full on TPU, off on CPU. Combine with "
                        "--compilation-cache so later restarts warm from "
                        "disk")
    p.add_argument("--log-json", action="store_true")
    p.add_argument("--api-key", default=None)
    p.add_argument("--rate-limit", type=int, default=0)
    p.add_argument("--max-pending", type=int, default=0)
    p.add_argument("--cross-host", action="store_true",
                   help="multi-host data-parallel serving: start this same "
                        "command on every host (VLLM_I64_TPU_COORDINATOR / "
                        "NUM_HOSTS / HOST_ID / HOST_IP env); host 0 routes "
                        "+ serves HTTP, other hosts run engine workers")
    p.add_argument("--metrics-port", type=int, default=0,
                   help="Prometheus exporter port (0 = off)")
    p.add_argument("--rag-index", default=None)
    p.add_argument("--sandbox", action="store_true")
    p.add_argument("--sandbox-timeout", type=int, default=30)
    p.add_argument("--sandbox-memory", type=int, default=256)
    p.add_argument("--sandbox-user", default=None)
    p.add_argument("--no-model", action="store_true")
    p.set_defaults(func=cmd_serve)

    p = sub.add_parser("list", help="List registered models")
    p.set_defaults(func=cmd_list)

    p = sub.add_parser("check", help="Check model availability")
    p.add_argument("model")
    p.set_defaults(func=cmd_check)

    p = sub.add_parser("bench", help="Run benchmarks")
    p.add_argument("--mode", default="all", choices=["all", "routing", "engine"])
    p.add_argument("--model", default="tr-hash-moe-500m")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--num-experts", type=int, default=4)
    p.add_argument("--requests", type=int, default=20)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--output-len", type=int, default=64)
    p.add_argument("--quantization", default="int8")
    p.add_argument("--tiny", action="store_true")
    p.set_defaults(func=cmd_bench)

    p = sub.add_parser("agent", help="Run the ReAct agent against a server")
    p.add_argument("task", nargs="*")
    p.add_argument("--server", default="http://localhost:8000")
    p.add_argument("--interactive", "-i", action="store_true")
    p.add_argument("--allow-shell", action="store_true")
    p.add_argument("--max-steps", type=int, default=20)
    p.add_argument("--temperature", type=float, default=0.6)
    p.add_argument("--max-tokens", type=int, default=1024)
    p.add_argument("--api-key", default=None)
    p.set_defaults(func=cmd_agent)

    p = sub.add_parser("estimate", help="Estimate TPU HBM requirements")
    p.add_argument("model")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--dtype", default="bfloat16", choices=list(_DTYPE_BYTES))
    p.add_argument("--kv-dtype", default=None)
    p.add_argument("--max-batch-size", type=int, default=32)
    p.add_argument("--max-seq-len", type=int, default=2048)
    p.set_defaults(func=cmd_estimate)

    args = parser.parse_args()
    if not args.command:
        parser.print_help()
        sys.exit(1)
    for axis in ("dp", "ep", "tp"):
        if getattr(args, axis, 1) < 1:
            parser.error(f"--{axis} must be >= 1")
    args.func(args)


if __name__ == "__main__":
    main()
