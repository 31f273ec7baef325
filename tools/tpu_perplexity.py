#!/usr/bin/env python
"""Perplexity delta harness: int8 (and optionally W8A8/int4) vs fp32.

The BASELINE.json north star is INT8 perplexity delta <= 0.01 vs the
reference INT8 engine on a shared eval set. Real checkpoints cannot be
fetched in this environment (zero egress), so this harness proves the
measurement end-to-end on random-init weights (the quantization error it
measures is real; only the absolute perplexity is synthetic). When real
checkpoints arrive the same command produces the gating number.

Prints one JSON line with fp32/int8 perplexities and the delta.

Usage:
  python tools/tpu_perplexity.py            # flagship shapes, on device
  python tools/tpu_perplexity.py --cpu --tiny --seqs 4 --len 128
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tr-hash-moe-500m")
    p.add_argument("--methods", default="int8")
    p.add_argument("--seqs", type=int, default=8)
    p.add_argument("--len", dest="seq_len", type=int, default=256)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from vllm_i64_tpu.benchmarks.perplexity import compare_quantization
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.models.presets import get_preset

    cfg = get_preset(args.model)
    if args.tiny:
        cfg = cfg.replace(num_hidden_layers=2, hidden_size=256,
                          intermediate_size=512, vocab_size=1024,
                          max_position_embeddings=512)
    dev = jax.devices()[0]
    print(f"[ppl] device: {dev.platform}", file=sys.stderr)

    import jax.numpy as jnp

    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    t0 = time.perf_counter()
    params = cdm.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    print(f"[ppl] params in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    seqs = [rng.integers(3, cfg.vocab_size, size=args.seq_len).tolist()
            for _ in range(args.seqs)]

    t0 = time.perf_counter()
    methods = tuple(m for m in args.methods.split(",") if m)
    out = compare_quantization(params, cfg, seqs, methods=methods)
    result = {
        "metric": "perplexity_delta_int8_vs_fp32",
        "value": out.get("int8", {}).get("delta_vs_fp32"),
        "unit": "ppl",
        "fp32_ppl": out["fp32"]["perplexity"],
        "tokens": out["fp32"]["total_tokens"],
        "elapsed_s": round(time.perf_counter() - t0, 1),
        "device": dev.platform,
        "weights": "random-init (checkpoint-free harness proof)",
    }
    for m in methods:
        result[f"{m}_ppl"] = out[m]["perplexity"]
        result[f"{m}_delta"] = out[m]["delta_vs_fp32"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
