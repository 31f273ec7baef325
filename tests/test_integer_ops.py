"""Integer fixed-point ops parity tests
(ref: tests/test_i64_pipeline.py integer-first invariants;
layers/integer_activations.py, moe.py softmax_integer)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_i64_tpu.ops.integer import (
    Q7,
    apply_rope_integer,
    build_rope_tables_integer,
    quantize_rmsnorm_weight,
    rms_norm_integer,
    sigmoid_integer,
    silu_integer,
    silu_multiply_integer,
    softmax_integer,
    softplus_integer,
)
from vllm_i64_tpu.ops.norms import apply_rope, rms_norm, rope_cos_sin


def test_silu_integer_matches_float_within_q7():
    x = np.linspace(-10, 10, 1001, dtype=np.float32)
    x_q7 = np.round(x * Q7).astype(np.int32)
    got = np.asarray(silu_integer(jnp.asarray(x_q7))) / Q7
    want = x / (1 + np.exp(-x))
    # Q7 resolution: 1/128 quantization in and out
    np.testing.assert_allclose(got, want, atol=2.5 / Q7)
    # integer dtype maintained
    assert silu_integer(jnp.asarray(x_q7)).dtype == jnp.int32


def test_silu_integer_tails():
    big = jnp.asarray([2000, -2000], jnp.int32)
    out = np.asarray(silu_integer(big))
    assert out[0] == 2000  # identity above +8
    assert out[1] == 0  # zero below -8


def test_sigmoid_softplus_integer():
    x = np.linspace(-9, 9, 501, dtype=np.float32)
    q = np.round(x * Q7).astype(np.int32)
    sig = np.asarray(sigmoid_integer(jnp.asarray(q))) / Q7
    np.testing.assert_allclose(sig, 1 / (1 + np.exp(-x)), atol=2.0 / Q7)
    sp = np.asarray(softplus_integer(jnp.asarray(q))) / Q7
    np.testing.assert_allclose(sp, np.log1p(np.exp(x)), atol=2.5 / Q7)


def test_silu_multiply_integer():
    rng = np.random.default_rng(0)
    gate = rng.standard_normal((64, 32)).astype(np.float32)
    up = rng.standard_normal((64, 32)).astype(np.float32)
    got = np.asarray(silu_multiply_integer(jnp.asarray(gate), jnp.asarray(up)))
    want = gate / (1 + np.exp(-gate)) * up
    np.testing.assert_allclose(got, want, atol=0.06)


def test_softmax_integer_close_to_float():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((16, 64)).astype(np.float32) * 3
    got = np.asarray(softmax_integer(jnp.asarray(logits)))
    want = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    np.testing.assert_allclose(got, np.asarray(want), atol=0.02)  # Q7 resolution
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-3)


def test_softmax_integer_deterministic_and_argmax_preserving():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((100, 32)).astype(np.float32) * 4
    a = np.asarray(softmax_integer(jnp.asarray(logits)))
    b = np.asarray(softmax_integer(jnp.asarray(logits)))
    np.testing.assert_array_equal(a, b)
    assert (a.argmax(-1) == logits.argmax(-1)).mean() > 0.99


def test_rms_norm_integer_close_to_float():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 128)).astype(np.float32)
    w = (rng.standard_normal(128) * 0.1 + 1.0).astype(np.float32)
    w_q12 = quantize_rmsnorm_weight(jnp.asarray(w))
    assert w_q12.dtype == jnp.int16
    got = np.asarray(rms_norm_integer(jnp.asarray(x), w_q12))
    want = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, atol=0.02)


def test_rope_integer_close_to_float():
    d = 32
    cos_t, sin_t = build_rope_tables_integer(64, d)
    assert cos_t.dtype == jnp.int16
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 5, 4, d)).astype(np.float32)
    positions = jnp.asarray([[0, 1, 2, 3, 10], [7, 8, 9, 10, 11]], jnp.int32)
    cos_q = jnp.take(cos_t, positions, axis=0)[:, :, None, :]
    sin_q = jnp.take(sin_t, positions, axis=0)[:, :, None, :]
    got = np.asarray(apply_rope_integer(jnp.asarray(x), cos_q, sin_q))
    cos, sin = rope_cos_sin(positions, d)
    want = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(got, want, atol=0.05)
