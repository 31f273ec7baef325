"""Side-by-side HTTP benchmark against any OpenAI-compatible server
(ref: benchmarks/bench_comparative.py:29-70 — TTFT/ITL/throughput over the
wire vs vLLM/TGI or another vllm-i64-tpu instance)."""

from __future__ import annotations

import json
import time
import urllib.request
from typing import Dict, List, Optional


def _post(base_url: str, endpoint: str, body: dict,
          api_key: Optional[str] = None, timeout: int = 600) -> dict:
    headers = {"Content-Type": "application/json"}
    if api_key:
        headers["Authorization"] = f"Bearer {api_key}"
    req = urllib.request.Request(
        f"{base_url.rstrip('/')}{endpoint}",
        data=json.dumps(body).encode(), headers=headers)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def _stream_completion(base_url: str, body: dict,
                       api_key: Optional[str] = None) -> Dict[str, float]:
    """One streamed completion; returns ttft/total/tokens measured on SSE."""
    headers = {"Content-Type": "application/json"}
    if api_key:
        headers["Authorization"] = f"Bearer {api_key}"
    req = urllib.request.Request(
        f"{base_url.rstrip('/')}/v1/completions",
        data=json.dumps({**body, "stream": True}).encode(), headers=headers)
    t0 = time.perf_counter()
    ttft = None
    chunks = 0
    with urllib.request.urlopen(req, timeout=600) as resp:
        for raw in resp:
            line = raw.decode("utf-8", errors="replace").strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            try:
                payload = json.loads(line[6:])
            except json.JSONDecodeError:
                continue
            text = payload.get("choices", [{}])[0].get("text", "")
            if text and ttft is None:
                ttft = time.perf_counter() - t0
            if text:
                chunks += 1
    total = time.perf_counter() - t0
    return {"ttft_s": ttft or total, "total_s": total, "chunks": chunks}


def bench_server(base_url: str, label: str, prompts: List[str],
                 max_tokens: int = 64,
                 api_key: Optional[str] = None) -> dict:
    """Run streamed completions against one server; aggregate metrics."""
    rows = []
    total_tokens = 0
    t_start = time.perf_counter()
    for prompt in prompts:
        r = _stream_completion(
            base_url,
            {"prompt": prompt, "max_tokens": max_tokens, "temperature": 0.0},
            api_key=api_key)
        rows.append(r)
        total_tokens += r["chunks"]
    wall = time.perf_counter() - t_start
    ttfts = sorted(r["ttft_s"] for r in rows)
    return {
        "label": label,
        "url": base_url,
        "num_requests": len(prompts),
        "total_tokens": total_tokens,
        "throughput_tok_s": round(total_tokens / max(wall, 1e-9), 2),
        "ttft_ms_p50": round(ttfts[len(ttfts) // 2] * 1000, 1),
        "ttft_ms_p99": round(ttfts[-1] * 1000, 1),
        "wall_s": round(wall, 2),
    }


def run_comparative(ours_url: str, theirs_url: Optional[str] = None,
                    num_requests: int = 8, prompt_len_chars: int = 256,
                    max_tokens: int = 64,
                    api_key: Optional[str] = None) -> dict:
    prompts = [f"[{i}] " + ("benchmark " * (prompt_len_chars // 10))
               for i in range(num_requests)]
    out = {"ours": bench_server(ours_url, "vllm-i64-tpu", prompts,
                                max_tokens, api_key)}
    if theirs_url:
        out["theirs"] = bench_server(theirs_url, "baseline", prompts,
                                     max_tokens, api_key)
        ours, theirs = out["ours"], out["theirs"]
        if theirs["throughput_tok_s"] > 0:
            out["speedup"] = round(
                ours["throughput_tok_s"] / theirs["throughput_tok_s"], 2)
    print(json.dumps(out, indent=2))
    return out
