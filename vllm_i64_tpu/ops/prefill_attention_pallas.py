"""Pallas flash prefill attention over the paged KV cache.

The XLA prefill path gathers the paged context dense and materializes the
(B, Hkv, G, T, S) score tensor — fine at 2k context, quadratic-memory
beyond. This kernel computes causal attention for one (sequence, q-tile)
per program with online softmax, streaming K/V pages HBM->VMEM exactly like
the decode kernel (ops/paged_attention_pallas.py).

Layout rules (same Mosaic findings as decode, validated on v5e):
- pages viewed as (NB, bs, Hkv*d): lane-aligned DMA slices
- per-kv-head computation is a STATIC python loop over Hkv with plain 2D
  dots (no batched dot_general, no 3D reshapes); q rows for one kv head are
  the G query heads x T_TILE tile rows, flattened to (G*T_TILE, d) ahead of
  the kernel so in-kernel slices are static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _prefill_kernel(
    bt_ref,  # (B, MB) int32 — scalar prefetch
    ctx_ref,  # (B,) int32
    start_ref,  # (B, n_t) int32 — first query position per (seq, tile)
    q_ref,  # (1, 1, Hkv*G*T_TILE, d) VMEM — kv-head-major flattened tile
    k_hbm,  # (NB, bs, Hkv*d) ANY
    v_hbm,
    o_ref,  # (1, 1, Hkv*G*T_TILE, d) VMEM
    k_buf,  # (2, C*bs, Hkv*d) VMEM scratch
    v_buf,
    m_ref,  # (Hkv*G*T_TILE, 1) f32
    l_ref,
    acc_ref,  # (Hkv*G*T_TILE, d) f32
    k_sems,
    v_sems,
    *,
    block_size: int,
    chunk_blocks: int,
    scale: float,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    t_tile: int,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    ctx = ctx_ref[b]
    q_start = start_ref[b, j]
    # only context up to the tile's last query position is ever attended
    visible = jnp.minimum(ctx, q_start + t_tile)
    n_blocks = pl.cdiv(visible, jnp.int32(block_size))
    n_chunks = pl.cdiv(n_blocks, jnp.int32(chunk_blocks))
    c_rows = chunk_blocks * block_size
    rows = num_kv_heads * group * t_tile
    d = head_dim

    def dma_pair(chunk, c, slot):
        bid = bt_ref[b, chunk * chunk_blocks + c]
        kd = pltpu.make_async_copy(
            k_hbm.at[bid],
            k_buf.at[slot, pl.ds(c * block_size, block_size)],
            k_sems.at[slot, c])
        vd = pltpu.make_async_copy(
            v_hbm.at[bid],
            v_buf.at[slot, pl.ds(c * block_size, block_size)],
            v_sems.at[slot, c])
        return kd, vd

    def start_chunk(chunk, slot):
        for c in range(chunk_blocks):
            @pl.when((chunk < n_chunks)
                     & (chunk * chunk_blocks + c < n_blocks))
            def _():
                kd, vd = dma_pair(chunk, c, slot)
                kd.start()
                vd.start()

    def wait_chunk(chunk, slot):
        for c in range(chunk_blocks):
            @pl.when((chunk < n_chunks)
                     & (chunk * chunk_blocks + c < n_blocks))
            def _():
                kd, vd = dma_pair(chunk, c, slot)
                kd.wait()
                vd.wait()

    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    start_chunk(0, 0)

    q_all = q_ref[0, 0].astype(jnp.float32)  # (Hkv*G*T_TILE, d)
    # query position of each flattened row: row % t_tile + q_start
    row_q_pos = (q_start
                 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
                 % t_tile)

    def body(chunk, _):
        slot = chunk % 2

        @pl.when(chunk + 1 < n_chunks)
        def _():
            start_chunk(chunk + 1, (chunk + 1) % 2)

        wait_chunk(chunk, slot)

        row_pos = (chunk * c_rows
                   + jax.lax.broadcasted_iota(jnp.int32, (c_rows, 1), 0))
        row_ok = row_pos < ctx
        kc = jnp.where(row_ok, k_buf[slot].astype(jnp.float32), 0.0)
        vc = jnp.where(row_ok, v_buf[slot].astype(jnp.float32), 0.0)

        # per-kv-head 2D dots, statically unrolled
        scores_parts = []
        for h in range(num_kv_heads):
            q_h = q_all[h * group * t_tile:(h + 1) * group * t_tile]
            k_h = kc[:, h * d:(h + 1) * d]  # (C*bs, d)
            scores_parts.append(jax.lax.dot_general(
                q_h, k_h, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        scores = jnp.concatenate(scores_parts, axis=0) * scale  # (rows, C*bs)

        k_pos = (chunk * c_rows
                 + jax.lax.broadcasted_iota(jnp.int32, (1, c_rows), 1))
        mask = (k_pos <= row_q_pos) & (k_pos < ctx)
        scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        m_new = jnp.maximum(m_new, -1e30)  # rows with no visible keys yet
        corr = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
        p = jnp.exp(scores - m_new)
        p = jnp.where(mask, p, 0.0)

        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv_parts = []
        for h in range(num_kv_heads):
            p_h = p[h * group * t_tile:(h + 1) * group * t_tile]
            v_h = vc[:, h * d:(h + 1) * d]
            pv_parts.append(jax.lax.dot_general(
                p_h, v_h, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        pv = jnp.concatenate(pv_parts, axis=0)
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    denom = jnp.maximum(l_ref[:], 1e-30)
    o_ref[:] = (acc_ref[:] / denom)[None, None].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "num_kv_heads", "chunk_blocks", "t_tile",
                     "scale", "interpret"))
def paged_prefill_attention_pallas(
    q: jax.Array,  # (B, T, Hq, d)
    k_cache: jax.Array,  # (NB, bs, HD) flat pages, HD = Hkv*d
    v_cache: jax.Array,
    block_tables: jax.Array,  # (B, MB)
    positions: jax.Array,  # (B, T) — must be start + arange(T) per row
    ctx_lens: jax.Array,  # (B,)
    *,
    block_size: int,
    num_kv_heads: int,
    chunk_blocks: int = 8,
    t_tile: int = 128,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Causal paged prefill attention. Requires contiguous per-row query
    positions (the engine's chunked-prefill layout). T must divide by
    t_tile after padding (caller pads)."""
    b, t, hq, d = q.shape
    nb, bs, hd = k_cache.shape
    hkv = num_kv_heads
    assert hd == hkv * d, (hd, hkv, d)
    g = hq // hkv
    mb = block_tables.shape[1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    t_tile = min(t_tile, t)
    assert t % t_tile == 0
    n_t = t // t_tile
    c = min(chunk_blocks, mb)

    # kv-head-major flatten: (B, n_t, Hkv*G*T_TILE, d)
    qt = q.reshape(b, n_t, t_tile, hkv, g, d)
    qt = qt.transpose(0, 1, 3, 4, 2, 5).reshape(
        b, n_t, hkv * g * t_tile, d)
    starts = positions[:, 0::t_tile]  # (B, n_t) first position per tile

    k_flat = k_cache.reshape(nb, bs, hd)
    v_flat = v_cache.reshape(nb, bs, hd)
    rows = hkv * g * t_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, rows, d),
                         lambda i, j, bt, cl, st: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, d),
                               lambda i, j, bt, cl, st: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, c * bs, hd), k_cache.dtype),
            pltpu.VMEM((2, c * bs, hd), v_cache.dtype),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, c)),
            pltpu.SemaphoreType.DMA((2, c)),
        ],
    )

    kernel = functools.partial(
        _prefill_kernel,
        block_size=bs, chunk_blocks=c, scale=float(scale),
        num_kv_heads=hkv, group=g, head_dim=d, t_tile=t_tile)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_t, rows, d), q.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(block_tables, ctx_lens, starts, qt, k_flat, v_flat)

    # unflatten back to (B, T, Hq, d)
    out = out.reshape(b, n_t, hkv, g, t_tile, d)
    out = out.transpose(0, 1, 4, 2, 3, 5).reshape(b, t, hq, d)
    return out


# Dispatch note: at the reference models' context lengths (<= 2048) the XLA
# gather path matches this kernel's speed on v5e (measured: 9.1 vs 9.6 ms,
# B=4 T=512), so ops/attention.py keeps XLA as the prefill default. This
# kernel is the long-context path: its memory is O(T*d) per program vs the
# XLA path's O(T*S) score materialization.
