"""MoE semantics: masked-dense dispatch must match the reference's
per-expert loop spec (ref: token_routed_mlp.py:132-186) bit-for-bit in fp32,
including top-k mixing, shared expert, and output scales."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_i64_tpu.ops.moe import compute_routes, route_mask, token_routed_mlp
from vllm_i64_tpu.ops.quant import quantize_int8, dequantize


def _loop_reference(
    x, token_ids, gate, up, down, table, primary_w,
    shared=None, routed_scale=1.0, shared_scale=1.0,
):
    """Direct numpy transcription of the reference per-expert loop semantics."""
    N = x.shape[0]
    K, V = table.shape
    E = gate.shape[0]
    routes = table[:, np.clip(token_ids, 0, V - 1)]

    def expert_forward(eids):
        out = np.zeros_like(x)
        for e in range(E):
            m = eids == e
            if not m.any():
                continue
            xe = x[m]
            inter = (xe @ gate[e]) * (1.0 / (1.0 + np.exp(-(xe @ gate[e])))) * (
                xe @ up[e]
            )
            out[m] = inter @ down[e]
        return out

    out = primary_w * expert_forward(routes[0])
    if K > 1:
        sec = (1.0 - primary_w) / (K - 1)
        for k in range(1, K):
            out = out + sec * expert_forward(routes[k])
    if shared is not None:
        sg, su, sd = shared
        g = x @ sg
        inter = g * (1.0 / (1.0 + np.exp(-g))) * (x @ su)
        out = routed_scale * out + shared_scale * (inter @ sd)
    else:
        out = routed_scale * out
    return out


def test_masked_dense_matches_loop_reference(rng):
    N, H, E, I, V, K = 17, 16, 4, 8, 64, 2
    x = rng.normal(size=(N, H)).astype(np.float64)
    gate = rng.normal(size=(E, H, I)).astype(np.float64) * 0.1
    up = rng.normal(size=(E, H, I)).astype(np.float64) * 0.1
    down = rng.normal(size=(E, I, H)).astype(np.float64) * 0.1
    sg = rng.normal(size=(H, I)).astype(np.float64) * 0.1
    su = rng.normal(size=(H, I)).astype(np.float64) * 0.1
    sd = rng.normal(size=(I, H)).astype(np.float64) * 0.1
    ids = rng.integers(0, V, size=(N,))
    table = np.stack([(np.arange(V) + k) % E for k in range(K)]).astype(np.int32)

    ref = _loop_reference(
        x, ids, gate, up, down, table, 0.7,
        shared=(sg, su, sd), routed_scale=1.3, shared_scale=0.5,
    )
    out = token_routed_mlp(
        jnp.asarray(x), jnp.asarray(ids),
        gate_w=jnp.asarray(gate), up_w=jnp.asarray(up), down_w=jnp.asarray(down),
        topk_table=jnp.asarray(table),
        num_experts=E, vocab_size=V, primary_weight=0.7,
        routed_output_scale=1.3,
        shared_gate=jnp.asarray(sg), shared_up=jnp.asarray(su),
        shared_down=jnp.asarray(sd), shared_output_scale=0.5,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-9, atol=1e-9)


def test_top1_primary_weight_is_one(rng):
    """top_k=1 ignores primary weight (ref :55-58)."""
    N, H, E, I, V = 5, 8, 2, 4, 32
    x = rng.normal(size=(N, H))
    gate = rng.normal(size=(E, H, I)) * 0.1
    up = rng.normal(size=(E, H, I)) * 0.1
    down = rng.normal(size=(E, I, H)) * 0.1
    ids = rng.integers(0, V, size=(N,))
    table = (np.arange(V) % E)[None].astype(np.int32)

    out = token_routed_mlp(
        jnp.asarray(x), jnp.asarray(ids),
        gate_w=jnp.asarray(gate), up_w=jnp.asarray(up), down_w=jnp.asarray(down),
        topk_table=jnp.asarray(table), num_experts=E, vocab_size=V,
        primary_weight=1.0,
    )
    ref = _loop_reference(x, ids, gate, up, down, table, 1.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-9, atol=1e-9)


def test_duplicate_routes_accumulate():
    """If two routes land on the same expert the weights add (ref :156-163)."""
    routes = jnp.array([[0, 1], [0, 2]], dtype=jnp.int32)  # token0: both route->e0
    mask = route_mask(routes, 4, 0.6)
    np.testing.assert_allclose(np.asarray(mask[0]), [1.0, 0, 0, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(mask[1]), [0, 0.6, 0.4, 0], atol=1e-7)


def test_out_of_range_token_ids_clamped():
    table = jnp.asarray(np.stack([np.arange(8) % 4]).astype(np.int32))
    routes = compute_routes(table, jnp.array([-5, 100], jnp.int32), 8)
    assert int(routes[0, 0]) == 0  # clamped to 0
    assert int(routes[0, 1]) == 7 % 4  # clamped to vocab-1


def test_shared_routed_learnable_gates(rng):
    """use_shared_routed_gates mixes via learnable scalars (ref :174-178)."""
    N, H, E, I, V = 4, 8, 2, 4, 16
    x = rng.normal(size=(N, H))
    common = dict(
        gate_w=jnp.asarray(rng.normal(size=(E, H, I)) * 0.1),
        up_w=jnp.asarray(rng.normal(size=(E, H, I)) * 0.1),
        down_w=jnp.asarray(rng.normal(size=(E, I, H)) * 0.1),
        topk_table=jnp.asarray((np.arange(V) % E)[None].astype(np.int32)),
        num_experts=E, vocab_size=V, primary_weight=1.0,
        shared_gate=jnp.asarray(rng.normal(size=(H, I)) * 0.1),
        shared_up=jnp.asarray(rng.normal(size=(H, I)) * 0.1),
        shared_down=jnp.asarray(rng.normal(size=(I, H)) * 0.1),
    )
    ids = jnp.asarray(rng.integers(0, V, size=(N,)))
    gated = token_routed_mlp(
        jnp.asarray(x), ids, **common,
        shared_output_gate=jnp.asarray(2.0), routed_output_gate=jnp.asarray(0.0),
    )
    scaled = token_routed_mlp(
        jnp.asarray(x), ids, **common,
        shared_output_scale=2.0, routed_output_scale=0.0,
    )
    np.testing.assert_allclose(np.asarray(gated), np.asarray(scaled), rtol=1e-9)


def test_int8_quantized_moe_close_to_float(rng):
    N, H, E, I, V = 16, 32, 4, 16, 64
    x = rng.normal(size=(N, H)).astype(np.float32)
    gate = (rng.normal(size=(E, H, I)) * 0.1).astype(np.float32)
    up = (rng.normal(size=(E, H, I)) * 0.1).astype(np.float32)
    down = (rng.normal(size=(E, I, H)) * 0.1).astype(np.float32)
    ids = jnp.asarray(rng.integers(0, V, size=(N,)))
    table = jnp.asarray((np.arange(V) % E)[None].astype(np.int32))

    kw = dict(topk_table=table, num_experts=E, vocab_size=V, primary_weight=1.0)
    f = token_routed_mlp(
        jnp.asarray(x), ids,
        gate_w=jnp.asarray(gate), up_w=jnp.asarray(up), down_w=jnp.asarray(down), **kw
    )
    q = token_routed_mlp(
        jnp.asarray(x), ids,
        gate_w=quantize_int8(jnp.asarray(gate)),
        up_w=quantize_int8(jnp.asarray(up)),
        down_w=quantize_int8(jnp.asarray(down)),
        **kw,
    )
    err = np.abs(np.asarray(f) - np.asarray(q)).max()
    ref_mag = np.abs(np.asarray(f)).max()
    assert err < 0.05 * ref_mag + 1e-3


def test_quantize_int8_roundtrip(rng):
    w = rng.normal(size=(32, 64)).astype(np.float32)
    qt = quantize_int8(jnp.asarray(w))
    assert qt.q.dtype == jnp.int8
    assert qt.s.shape == (64,)
    wd = np.asarray(dequantize(qt))
    # max error bounded by scale/2 per column
    col_scale = np.abs(w).max(axis=0) / 127.0
    assert (np.abs(wd - w) <= col_scale[None, :] * 0.5 + 1e-8).all()
