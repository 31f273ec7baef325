#!/usr/bin/env python
"""One-command on-TPU validation queue (ROADMAP round-3 order).

Runs, in order, each step as a subprocess with its own timeout, and writes
one JSON line per step to stdout + tools/tpu_gate_report.jsonl:

  1. bench.py                      — driver-verified throughput number
  2. tools/tpu_kernel_check.py     — Pallas kernels compile on-chip
  3. tools/tpu_flash_decode_ab.py  — XLA gather vs library paged kernel
  4. bench.py --fused-norm-quant   — fused rmsnorm+quant A/B
  5. tools/tpu_perplexity.py       — int8-vs-fp32 delta on-chip

Steps that fail record the error and the queue continues. Use --only to
run a subset (comma list of step names).
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent

STEPS = [
    ("bench", [sys.executable, "bench.py"], 3600),
    ("kernel_check", [sys.executable, "tools/tpu_kernel_check.py"], 3600),
    ("flash_decode_ab",
     [sys.executable, "tools/tpu_flash_decode_ab.py", "--iters", "10"], 3600),
    ("bench_fused_norm_quant",
     [sys.executable, "bench.py", "--fused-norm-quant"], 3600),
    ("perplexity",
     [sys.executable, "tools/tpu_perplexity.py", "--seqs", "4",
      "--len", "256"], 3600),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--only", default="",
                   help="comma-separated subset of step names")
    args = p.parse_args()
    only = {s for s in args.only.split(",") if s}

    report = HERE / "tools" / "tpu_gate_report.jsonl"
    out = open(report, "a", encoding="utf-8")
    for name, cmd, timeout in STEPS:
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        row = {"step": name, "cmd": " ".join(cmd[1:]),
               "started": time.strftime("%Y-%m-%d %H:%M:%S")}
        try:
            r = subprocess.run(cmd, cwd=HERE, capture_output=True,
                               text=True, timeout=timeout)
            row["rc"] = r.returncode
            # keep every JSON line the step printed
            row["results"] = [
                json.loads(line) for line in r.stdout.splitlines()
                if line.strip().startswith("{")
            ]
            if r.returncode != 0:
                row["stderr_tail"] = r.stderr[-1500:]
        except subprocess.TimeoutExpired:
            row["rc"] = -1
            row["error"] = f"timeout after {timeout}s"
        row["elapsed_s"] = round(time.perf_counter() - t0, 1)
        line = json.dumps(row)
        print(line, flush=True)
        out.write(line + "\n")
        out.flush()
    out.close()
    print(f"[gate] report appended to {report}", file=sys.stderr)


if __name__ == "__main__":
    main()
