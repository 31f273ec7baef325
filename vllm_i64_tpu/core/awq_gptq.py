"""AWQ / GPTQ pre-quantized checkpoint import.

Mirrors the reference's unpack semantics (ref: vllm_i64/core/awq_gptq.py):
- qweight int32, 8 nibbles LSB-first along the input axis -> (in, out)
- qzeros int32, 8 nibbles LSB-first along the output axis -> (groups, out),
  with the AutoAWQ/GPTQ +1 zero-point offset restored
- GPTQ desc_act: per-ROW (scales/zeros)[g_idx] dequant — g_idx maps each
  stored input channel to its group (deviation: the reference permutes
  rows by argsort(g_idx) without inverting, ref :246-273, which misaligns
  weights with activations; we keep the rows in place)
- dequant: (q - z) * s per group over the input axis

The converter rewrites each quantized tensor group into a plain float
``<prefix>.weight`` (torch (out, in) orientation) so the standard loader
consumes it; serving re-quantization (int8/int4) happens in
core/quantize_model.py.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger("vllm_i64_tpu.awq_gptq")


@dataclass
class QuantConfig:
    method: str  # "awq" | "gptq"
    bits: int = 4
    group_size: int = 128
    desc_act: bool = False


def detect_quant_config(checkpoint_path: str) -> Optional[Tuple[str, QuantConfig]]:
    """Read quantization_config from config.json (ref: awq_gptq.py:62-113)."""
    p = Path(checkpoint_path)
    cfg_path = p / "config.json" if p.is_dir() else p.parent / "config.json"
    if not cfg_path.exists():
        return None
    with open(cfg_path, encoding="utf-8") as f:
        data = json.load(f)
    qc = data.get("quantization_config")
    if not isinstance(qc, dict):
        return None
    method = (qc.get("quant_method") or qc.get("method") or "").lower()
    if method not in ("awq", "gptq"):
        return None
    return method, QuantConfig(
        method=method,
        bits=int(qc.get("bits", qc.get("w_bit", 4))),
        group_size=int(qc.get("group_size", qc.get("q_group_size", 128))),
        desc_act=bool(qc.get("desc_act", False)),
    )


def _unpack_nibbles_rows(qweight: np.ndarray) -> np.ndarray:
    """(in//8, out) int32 -> (in, out) uint8, LSB-first nibbles along rows."""
    qw = qweight.astype(np.uint32)
    parts = [((qw >> shift) & 0xF) for shift in range(0, 32, 4)]
    stacked = np.stack(parts, axis=1)  # (in//8, 8, out)
    rows, _, cols = stacked.shape
    return stacked.reshape(rows * 8, cols).astype(np.uint8)


def _unpack_nibbles_cols(qzeros: np.ndarray) -> np.ndarray:
    """(groups, out//8) int32 -> (groups, out) uint8, LSB-first nibbles."""
    qz = qzeros.astype(np.uint32)
    parts = [((qz >> shift) & 0xF) for shift in range(0, 32, 4)]
    stacked = np.stack(parts, axis=-1)  # (groups, out//8, 8)
    g = stacked.shape[0]
    return stacked.reshape(g, -1).astype(np.uint8)


def dequantize_awq_gptq(
    qweight: np.ndarray,
    scales: np.ndarray,
    qzeros: Optional[np.ndarray],
    g_idx: Optional[np.ndarray],
    cfg: QuantConfig,
) -> np.ndarray:
    """Unpack + dequantize to a float32 weight of shape (in, out)."""
    if cfg.bits != 4:
        raise ValueError(f"only 4-bit {cfg.method} supported, got {cfg.bits}")
    w = _unpack_nibbles_rows(qweight).astype(np.float32)  # (in, out)
    n_in, n_out = w.shape
    scales = np.asarray(scales, np.float32)  # (groups, out)
    groups = scales.shape[0]

    if qzeros is not None:
        z = _unpack_nibbles_cols(qzeros).astype(np.float32)
        # packing subtracted 1 from zero points; restore it
        # (ref: awq_gptq.py:371-374)
        z = np.clip(z + 1.0, 0, 15)
    else:
        z = np.full((groups, n_out), 8.0, np.float32)

    if g_idx is not None and cfg.desc_act:
        # desc_act: qweight rows are stored in ORIGINAL input-channel order
        # with g_idx mapping each row to its quantization group — dequantize
        # per row via a scales/zeros gather so the weight stays aligned with
        # the activations. (The reference instead permutes the rows by
        # argsort(g_idx) and never inverts the permutation,
        # ref :246-273 — input channel j would multiply the weight row of a
        # DIFFERENT channel. Deliberate deviation: we keep the math right;
        # tests/test_awq_reference_parity.py documents it.)
        g = np.clip(np.asarray(g_idx, np.int64), 0, groups - 1)
        return (w - z[g]) * scales[g]

    gs = n_in // groups
    wg = w.reshape(groups, gs, n_out)
    return ((wg - z[:, None]) * scales[:, None]).reshape(n_in, n_out)


@dataclass
class Q4Parts:
    """Unpacked-but-still-int4 weight in the serving Q4Tensor layout
    (numpy, logical x@w orientation (in, out)): the DIRECT int4 load path
    that skips the dequant->requant round-trip (ref: the reference serves
    its internal INT4 format straight from the AWQ/GPTQ unpack,
    core/quantization.py:307-421)."""

    packed: np.ndarray  # (in // 2, out) uint8, row 2i high nibble, 2i+1 low
    scales: np.ndarray  # (groups, out) f32
    zeros: np.ndarray  # (groups, out) f32, dequant-ready
    group_size: int

    @property
    def shape(self):
        half, out = self.packed.shape[-2:]
        return (*self.packed.shape[:-2], half * 2, out)

    @property
    def ndim(self):  # stacking code treats it like an array
        return self.packed.ndim + 0


def unpack_to_q4_parts(
    qweight: np.ndarray,
    scales: np.ndarray,
    qzeros: Optional[np.ndarray],
    g_idx: Optional[np.ndarray],
    cfg: QuantConfig,
) -> Optional[Q4Parts]:
    """Unpack AWQ/GPTQ int4 into the native Q4Tensor component layout
    WITHOUT dequantizing. Returns None when the shape can't align
    (odd input dim or input not divisible by the group size) — the caller
    falls back to the float conversion for that tensor.

    Bit-exactness: Q4Tensor dequant is (q - z) * s per input-axis group —
    the identical formula dequantize_awq_gptq applies — so serving these
    parts yields bit-identical logits to loading the float conversion."""
    if cfg.bits != 4:
        return None
    w = _unpack_nibbles_rows(qweight)  # (in, out) uint8
    n_in, n_out = w.shape
    scales = np.asarray(scales, np.float32)
    groups = scales.shape[0]
    if n_in % 2 or groups == 0 or n_in % groups:
        return None
    if g_idx is not None and cfg.desc_act:
        # desc_act assigns groups per-ROW via g_idx; the Q4Tensor layout
        # needs contiguous input-axis groups — serve through the float
        # conversion instead (correct per-row dequant there)
        return None
    gs = n_in // groups
    if qzeros is not None:
        z = _unpack_nibbles_cols(qzeros).astype(np.float32)
        z = np.clip(z + 1.0, 0, 15)  # restore the packing's -1 offset
    else:
        z = np.full((groups, n_out), 8.0, np.float32)
    packed = (w[0::2].astype(np.uint8) << 4) | w[1::2].astype(np.uint8)
    return Q4Parts(packed=packed, scales=scales, zeros=z, group_size=gs)


def convert_quantized_state_dict(
    sd: Dict[str, np.ndarray], cfg: QuantConfig, direct: bool = True
) -> Dict[str, np.ndarray]:
    """Replace {prefix}.qweight/qzeros/scales/g_idx groups with either a
    direct-served ``Q4Parts`` (already (in, out) oriented; default) or a
    plain float {prefix}.weight in torch (out, in) orientation.

    direct=True avoids the dequant->requant double rounding entirely; a
    tensor whose shape can't align to the Q4 layout falls back to float
    for that tensor alone."""
    prefixes = sorted({k[: -len("qweight")] for k in sd
                       if k.endswith(".qweight")})
    out: Dict[str, np.ndarray] = {}
    consumed = set()
    n_direct = 0
    for prefix in prefixes:
        qweight = sd.get(prefix + "qweight")
        scales = sd.get(prefix + "scales")
        if qweight is None or scales is None:
            logger.warning("incomplete quantized group at %s", prefix)
            continue
        qzeros = sd.get(prefix + "qzeros")
        g_idx = sd.get(prefix + "g_idx")
        parts = (
            unpack_to_q4_parts(qweight, scales, qzeros, g_idx, cfg)
            if direct else None
        )
        if parts is not None:
            out[prefix + "weight"] = parts  # (in, out): no transpose later
            n_direct += 1
        else:
            w = dequantize_awq_gptq(qweight, scales, qzeros, g_idx, cfg)
            out[prefix + "weight"] = w.T  # torch (out, in)
        for suffix in ("qweight", "qzeros", "scales", "g_idx"):
            consumed.add(prefix + suffix)
        if prefix + "bias" in sd:
            out[prefix + "bias"] = sd[prefix + "bias"]
            consumed.add(prefix + "bias")
    for k, v in sd.items():
        if k not in consumed and k not in out:
            out[k] = v
    logger.info("converted %d %s-quantized tensors (%d served direct-int4)",
                len(prefixes), cfg.method, n_direct)
    return out
