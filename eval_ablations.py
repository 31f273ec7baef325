#!/usr/bin/env python
"""Ablation quality harness: routed vs dense comparison over the HTTP API
(ref: /root/reference/eval_ablations.py:1-75, 167-260 — starts a server per
model, runs completion prompts, records per-prompt latency + token stats to
ablation_results.json)."""

from __future__ import annotations

import argparse
import json
import time
import urllib.request

PROMPTS = [
    "The capital of France is",
    "In mathematics, a prime number is",
    "def fibonacci(n):",
    "The three primary colors are",
    "Water boils at a temperature of",
    "To be or not to be,",
    "The speed of light is approximately",
    "A haiku about mountains:",
]


def run_completions(base_url: str, model: str, max_tokens: int,
                    api_key: str | None) -> list[dict]:
    results = []
    for prompt in PROMPTS:
        body = json.dumps({
            "prompt": prompt, "max_tokens": max_tokens, "temperature": 0.0,
        }).encode()
        headers = {"Content-Type": "application/json"}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"
        req = urllib.request.Request(
            f"{base_url}/v1/completions", data=body, headers=headers)
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(req, timeout=600) as resp:
                out = json.loads(resp.read())
            latency_ms = (time.perf_counter() - t0) * 1000
            choice = out["choices"][0]
            results.append({
                "model": model,
                "prompt": prompt,
                "completion": choice["text"],
                "finish_reason": choice["finish_reason"],
                "completion_tokens": out["usage"]["completion_tokens"],
                "latency_ms": round(latency_ms, 1),
                "tok_per_s": round(
                    out["usage"]["completion_tokens"] / (latency_ms / 1000), 2),
            })
            print(f"  [{model}] {prompt[:40]!r} -> "
                  f"{results[-1]['tok_per_s']} tok/s")
        except Exception as exc:
            results.append({"model": model, "prompt": prompt,
                            "error": str(exc)})
            print(f"  [{model}] {prompt[:40]!r} -> ERROR {exc}")
    return results


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--server", default="http://localhost:8000",
                   help="running vllm-i64-tpu server")
    p.add_argument("--models", nargs="*",
                   default=["tr-hash-moe-500m", "dense-306"],
                   help="labels recorded per run (server serves one model; "
                        "run once per served model)")
    p.add_argument("--max-tokens", type=int, default=64)
    p.add_argument("--api-key", default=None)
    p.add_argument("--output", default="ablation_results.json")
    args = p.parse_args()

    all_results = []
    for model in args.models[:1]:
        print(f"== {model} @ {args.server}")
        all_results.extend(
            run_completions(args.server, model, args.max_tokens, args.api_key))

    ok = [r for r in all_results if "error" not in r]
    summary = {
        "num_prompts": len(all_results),
        "succeeded": len(ok),
        "avg_latency_ms": round(
            sum(r["latency_ms"] for r in ok) / len(ok), 1) if ok else None,
        "avg_tok_per_s": round(
            sum(r["tok_per_s"] for r in ok) / len(ok), 2) if ok else None,
        "results": all_results,
    }
    with open(args.output, "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {args.output}: {summary['succeeded']}/"
          f"{summary['num_prompts']} ok, "
          f"avg {summary['avg_tok_per_s']} tok/s")


if __name__ == "__main__":
    main()
