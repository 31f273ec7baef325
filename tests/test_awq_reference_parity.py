"""AWQ/GPTQ unpack parity against the REFERENCE implementation.

Imports /root/reference's awq_gptq module directly and checks our unpack +
dequant produce bit-identical results on the same fixture arrays
(VERDICT r1 item 9: "AWQ/GPTQ fixture round-trip vs reference unpack").
Skipped when the reference tree or torch is unavailable.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
try:
    from vllm_i64.core import awq_gptq as ref_awq
except Exception:  # pragma: no cover
    ref_awq = None

pytestmark = pytest.mark.skipif(ref_awq is None,
                                reason="reference tree not importable")

from vllm_i64_tpu.core.awq_gptq import (  # noqa: E402
    QuantConfig,
    _unpack_nibbles_cols,
    _unpack_nibbles_rows,
    dequantize_awq_gptq,
    unpack_to_q4_parts,
)


@pytest.fixture
def rng():
    return np.random.default_rng(123)


def pack_rows(q: np.ndarray) -> np.ndarray:
    n_in, n_out = q.shape
    out = np.zeros((n_in // 8, n_out), np.uint32)
    for i in range(8):
        out |= q[i::8].astype(np.uint32) << (4 * i)
    return out.astype(np.int32)


def pack_cols(z: np.ndarray) -> np.ndarray:
    g, n_out = z.shape
    out = np.zeros((g, n_out // 8), np.uint32)
    for i in range(8):
        out |= z[:, i::8].astype(np.uint32) << (4 * i)
    return out.astype(np.int32)


class TestUnpackParity:
    def test_awq_qweight_unpack_bit_identical(self, rng):
        q = rng.integers(0, 16, (256, 64)).astype(np.uint8)
        packed = pack_rows(q)
        ours = _unpack_nibbles_rows(packed)
        ref = ref_awq._unpack_awq_qweight(torch.from_numpy(packed)).numpy()
        np.testing.assert_array_equal(ours, ref)
        np.testing.assert_array_equal(ours, q)

    def test_gptq_qweight_unpack_bit_identical(self, rng):
        q = rng.integers(0, 16, (128, 32)).astype(np.uint8)
        packed = pack_rows(q)
        ours = _unpack_nibbles_rows(packed)
        ref = ref_awq._unpack_gptq_qweight(torch.from_numpy(packed)).numpy()
        np.testing.assert_array_equal(ours, ref)

    def test_awq_qzeros_unpack_bit_identical(self, rng):
        z = rng.integers(0, 16, (4, 64)).astype(np.uint8)
        packed = pack_cols(z)
        ours = _unpack_nibbles_cols(packed)
        ref = ref_awq._unpack_awq_qzeros(torch.from_numpy(packed)).numpy()
        np.testing.assert_array_equal(ours, ref)
        np.testing.assert_array_equal(ours, z)

    def test_gptq_qzeros_unpack_bit_identical(self, rng):
        z = rng.integers(0, 16, (2, 32)).astype(np.uint8)
        packed = pack_cols(z)
        ours = _unpack_nibbles_cols(packed)
        ref = ref_awq._unpack_gptq_qzeros(torch.from_numpy(packed)).numpy()
        np.testing.assert_array_equal(ours, ref)

    def test_gptq_desc_act_deviates_from_reference_reorder(self, rng):
        """DELIBERATE deviation: the reference permutes qweight rows by
        argsort(g_idx) and never inverts the permutation
        (ref _reorder_by_g_idx), which misaligns input channels with
        activations. We dequantize per row via (scales/zeros)[g_idx]
        instead — row i keeps its place and its own group constants."""
        from vllm_i64_tpu.core.awq_gptq import QuantConfig, dequantize_awq_gptq

        q = rng.integers(0, 16, (256, 16)).astype(np.uint8)
        g_idx = (rng.permutation(256) // 128).astype(np.int64)
        scales = rng.random((2, 16)).astype(np.float32) + 0.5
        cfg = QuantConfig(method="gptq", bits=4, group_size=128,
                          desc_act=True)
        zeros8 = np.full((2, 16), 7, np.uint8)  # stored z-1 for z=8
        ours = dequantize_awq_gptq(
            pack_rows(q), scales, pack_cols(zeros8), g_idx, cfg)
        want = (q.astype(np.float32) - 8.0) * scales[g_idx]
        np.testing.assert_allclose(ours, want)
        # and the reference WOULD have permuted the rows (asserting the
        # divergence is real, not accidental agreement)
        ref_rows = ref_awq._reorder_by_g_idx(
            torch.from_numpy(q), torch.from_numpy(g_idx), 128, 2).numpy()
        assert not np.array_equal(ref_rows, q)


class TestDequantParity:
    def test_full_dequant_matches_reference_formula(self, rng):
        """(q - (z_stored + 1)) * s over input-axis groups, the formula the
        reference applies after unpack (ref: awq_gptq.py:371-374)."""
        n_in, n_out, gs = 256, 48, 128
        q = rng.integers(0, 16, (n_in, n_out)).astype(np.uint8)
        z_true = rng.integers(1, 15, (n_in // gs, n_out)).astype(np.uint8)
        s = (rng.random((n_in // gs, n_out)).astype(np.float32) + 0.1) * 0.02

        cfg = QuantConfig(method="awq", bits=4, group_size=gs)
        ours = dequantize_awq_gptq(
            pack_rows(q), s, pack_cols((z_true - 1).astype(np.uint8)),
            None, cfg)

        # reference-side computation with the reference's own unpackers
        rq = ref_awq._unpack_awq_qweight(
            torch.from_numpy(pack_rows(q))).float()
        rz = ref_awq._unpack_awq_qzeros(
            torch.from_numpy(pack_cols((z_true - 1).astype(np.uint8)))
        ).float().clamp(max=14) + 1.0
        want = ((rq.reshape(-1, gs, n_out)
                 - rz[:, None]) * torch.from_numpy(s)[:, None])
        np.testing.assert_array_equal(
            ours, want.reshape(n_in, n_out).numpy())

    def test_direct_q4_parts_dequant_matches_reference(self, rng):
        n_in, n_out, gs = 128, 32, 64
        q = rng.integers(0, 16, (n_in, n_out)).astype(np.uint8)
        z_true = rng.integers(1, 15, (n_in // gs, n_out)).astype(np.uint8)
        s = (rng.random((n_in // gs, n_out)).astype(np.float32) + 0.1) * 0.02
        cfg = QuantConfig(method="awq", bits=4, group_size=gs)

        parts = unpack_to_q4_parts(
            pack_rows(q), s, pack_cols((z_true - 1).astype(np.uint8)),
            None, cfg)
        assert parts is not None
        high = (parts.packed >> 4) & 0xF
        low = parts.packed & 0xF
        qq = np.stack([high, low], axis=1).reshape(n_in, n_out)
        w_direct = ((qq.astype(np.float32).reshape(-1, gs, n_out)
                     - parts.zeros[:, None]) * parts.scales[:, None]
                    ).reshape(n_in, n_out)

        float_path = dequantize_awq_gptq(
            pack_rows(q), s, pack_cols((z_true - 1).astype(np.uint8)),
            None, cfg)
        np.testing.assert_array_equal(w_direct, float_path)
