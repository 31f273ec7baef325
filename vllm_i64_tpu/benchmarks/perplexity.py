"""Perplexity evaluation — the north-star quality metric.

Computes token-level NLL/perplexity of a model over token sequences, for
comparing quantized configurations against fp32 (BASELINE.json north star:
INT8 perplexity delta <= 0.01 vs the reference INT8 engine on the same
eval set).
"""

from __future__ import annotations

import math
from typing import Iterable, List

import numpy as np


def sequence_nll(params, cfg, token_ids: List[int]) -> float:
    """Sum of -log p(t_i | t_<i) over positions 1..n-1 (nats)."""
    import jax.numpy as jnp

    from ..models import complexity_deep as cdm

    ids = jnp.asarray([token_ids], jnp.int32)
    logits = np.asarray(cdm.forward(params, cfg, ids), np.float64)[0]
    total = 0.0
    for i in range(len(token_ids) - 1):
        row = logits[i]
        row = row - row.max()
        logz = math.log(np.exp(row).sum())
        total += logz - row[token_ids[i + 1]]
    return total


def evaluate_perplexity(params, cfg, sequences: Iterable[List[int]],
                        max_len: int = 512) -> dict:
    """Corpus perplexity over token sequences."""
    total_nll = 0.0
    total_tokens = 0
    n_seqs = 0
    for seq in sequences:
        seq = list(seq)[:max_len]
        if len(seq) < 2:
            continue
        total_nll += sequence_nll(params, cfg, seq)
        total_tokens += len(seq) - 1
        n_seqs += 1
    ppl = math.exp(total_nll / max(total_tokens, 1))
    return {
        "perplexity": round(ppl, 4),
        "nll_per_token": round(total_nll / max(total_tokens, 1), 6),
        "total_tokens": total_tokens,
        "num_sequences": n_seqs,
    }


def compare_quantization(params, cfg, sequences: Iterable[List[int]],
                         methods=("int8",)) -> dict:
    """fp32-vs-quantized perplexity deltas (the north-star check)."""
    from ..core.quantize_model import quantize_params

    seqs = [list(s) for s in sequences]
    base = evaluate_perplexity(params, cfg, seqs)
    out = {"fp32": base}
    for method in methods:
        qp = quantize_params(params, cfg, method)
        r = evaluate_perplexity(qp, cfg, seqs)
        r["delta_vs_fp32"] = round(r["perplexity"] - base["perplexity"], 4)
        out[method] = r
    return out
