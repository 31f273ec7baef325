"""Pallas paged-attention decode kernel (flash-style, block-table aware).

The XLA path in ops/attention.py gathers the paged context into a dense
(B, S, Hkv, d) array — that materialization costs an extra HBM round-trip
of the whole context every layer. This kernel streams K/V pages HBM->VMEM
with double-buffered DMA directly off the block table and keeps the online
softmax state in VMEM, so each context byte is read exactly once.

Reference analog: the "fully vectorized tensor paged decode" backend
(ref: vllm_i64/layers/attention.py:469-514) — same math, TPU dataflow.

Mosaic-friendly layout decisions (found the hard way on real v5e):
- K/V pages are viewed as (NB, bs, Hkv*d): the minor dim is lane-aligned
  (Hkv*d is a multiple of 128 for these models), so per-block DMA slices
  and all matmuls are clean 2D ops. (bs, Hkv, d) slices with d=64 trip
  Mosaic's tiled-memref slicing.
- GQA is handled by zero-expanding q to (Hq, Hkv*d): each query head's
  segment holds its own kv-head's d columns, zeros elsewhere. Scores and
  p@V become single 2D matmuls; the d-column segment of the output is
  selected by a VPU mask at the end. The extra MACs are negligible at
  decode batch sizes (the MXU is latency- not throughput-bound here).
- grid = (B,); one program owns one sequence. Pages are fetched in chunks
  of C consecutive logical blocks with two rotating buffers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _decode_kernel(
    bt_ref,  # (B, MB) int32 — scalar prefetch
    ctx_ref,  # (B,) int32 — scalar prefetch
    runs_ref,  # (B, NC) int32 — 1 if chunk's blocks are physically contiguous
    q_ref,  # (1, Hq, d) VMEM
    k_hbm,  # (NB*bs, Hkv*d) ANY/HBM — flat row view of the paged cache
    v_hbm,
    o_ref,  # (1, Hq, d) VMEM
    *rest,  # [stats_ref if return_stats] + scratch refs
    block_size: int,
    chunk_blocks: int,
    scale: float,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    return_stats: bool = False,
):
    if return_stats:
        # (1, Hq, 128) f32: column 0 = running max m, column 1 = sum l —
        # lane-padded because a (Hq, 1) OUTPUT block trips Mosaic tiling
        # (scratch refs of that shape are fine)
        stats_ref, *rest = rest
    (k_buf, v_buf, m_ref, l_ref, acc_ref,
     k_sems, v_sems, k_run_sems, v_run_sems) = rest
    b = pl.program_id(0)
    ctx = ctx_ref[b]
    n_blocks = pl.cdiv(ctx, jnp.int32(block_size))
    n_chunks = pl.cdiv(n_blocks, jnp.int32(chunk_blocks))
    c_rows = chunk_blocks * block_size
    hq = num_kv_heads * group
    hd = num_kv_heads * head_dim

    def dma_pair(chunk, c, slot):
        bid = bt_ref[b, chunk * chunk_blocks + c]
        kd = pltpu.make_async_copy(
            k_hbm.at[pl.ds(bid * block_size, block_size)],
            k_buf.at[slot, pl.ds(c * block_size, block_size)],
            k_sems.at[slot, c],
        )
        vd = pltpu.make_async_copy(
            v_hbm.at[pl.ds(bid * block_size, block_size)],
            v_buf.at[slot, pl.ds(c * block_size, block_size)],
            v_sems.at[slot, c],
        )
        return kd, vd

    def run_dma_pair(chunk, slot):
        # whole chunk in ONE DMA: blocks are physically consecutive, so the
        # flat cache rows [bid0*bs, bid0*bs + C*bs) are one contiguous span.
        # Per-page DMAs cost ~0.8us of scalar-core issue each (measured on
        # v5e: B=64 x 17 pages x 2 = 91 ms/iter vs 46 for the XLA gather at
        # ctx 2048); run DMAs amortize that issue cost C-fold.
        bid0 = bt_ref[b, chunk * chunk_blocks]
        kd = pltpu.make_async_copy(
            k_hbm.at[pl.ds(bid0 * block_size, c_rows)],
            k_buf.at[slot],
            k_run_sems.at[slot],
        )
        vd = pltpu.make_async_copy(
            v_hbm.at[pl.ds(bid0 * block_size, c_rows)],
            v_buf.at[slot],
            v_run_sems.at[slot],
        )
        return kd, vd

    def start_chunk(chunk, slot):
        is_run = runs_ref[b, chunk % runs_ref.shape[1]] == 1

        @pl.when((chunk < n_chunks) & is_run)
        def _():
            kd, vd = run_dma_pair(chunk, slot)
            kd.start()
            vd.start()

        for c in range(chunk_blocks):
            @pl.when((chunk < n_chunks) & jnp.logical_not(is_run)
                     & (chunk * chunk_blocks + c < n_blocks))
            def _():
                kd, vd = dma_pair(chunk, c, slot)
                kd.start()
                vd.start()

    def wait_chunk(chunk, slot):
        is_run = runs_ref[b, chunk % runs_ref.shape[1]] == 1

        @pl.when((chunk < n_chunks) & is_run)
        def _():
            kd, vd = run_dma_pair(chunk, slot)
            kd.wait()
            vd.wait()

        for c in range(chunk_blocks):
            @pl.when((chunk < n_chunks) & jnp.logical_not(is_run)
                     & (chunk * chunk_blocks + c < n_blocks))
            def _():
                kd, vd = dma_pair(chunk, c, slot)
                kd.wait()
                vd.wait()

    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    start_chunk(0, 0)

    # zero-expanded GQA query: (Hq, Hkv*d); column c belongs to kv head c//d,
    # query head h reads only its own kv head's segment (h//g)
    q = q_ref[0].astype(jnp.float32)  # (Hq, d)
    q_tiled = jnp.concatenate([q] * num_kv_heads, axis=1)  # (Hq, Hkv*d)
    col_kv = jax.lax.broadcasted_iota(jnp.int32, (hq, hd), 1) // head_dim
    row_kv = jax.lax.broadcasted_iota(jnp.int32, (hq, hd), 0) // group
    seg_mask = col_kv == row_kv
    q_exp = jnp.where(seg_mask, q_tiled, 0.0)

    def body(chunk, _):
        slot = chunk % 2

        @pl.when(chunk + 1 < n_chunks)
        def _():
            start_chunk(chunk + 1, (chunk + 1) % 2)

        wait_chunk(chunk, slot)

        # zero un-DMA'd rows: 0 * garbage (possibly NaN) would poison the
        # p @ V accumulation even though p is 0 there
        row_pos = (chunk * c_rows
                   + jax.lax.broadcasted_iota(jnp.int32, (c_rows, 1), 0))
        row_ok = row_pos < ctx
        k = jnp.where(row_ok, k_buf[slot].astype(jnp.float32), 0.0)
        v = jnp.where(row_ok, v_buf[slot].astype(jnp.float32), 0.0)

        # scores (Hq, C*bs): contraction over the expanded Hkv*d axis picks
        # out each query head's own kv head automatically
        scores = jax.lax.dot_general(
            q_exp, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        scores = jnp.where(row_pos.reshape(1, c_rows) < ctx, scores, NEG_INF)

        m_prev = m_ref[:]  # (Hq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        corr = jnp.where(jnp.isfinite(m_prev), corr, 0.0)
        p = jnp.exp(scores - m_new)
        p = jnp.where(row_pos.reshape(1, c_rows) < ctx, p, 0.0)

        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        # (Hq, C*bs) @ (C*bs, Hkv*d) -> (Hq, Hkv*d); only the own-kv segment
        # is consumed at the end
        pv = jax.lax.dot_general(
            p, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    denom = jnp.maximum(l_ref[:], 1e-30)  # (Hq, 1)
    full = acc_ref[:] / denom  # (Hq, Hkv*d)
    # select each query head's own kv segment: VPU mask, then sum the
    # static d-column segments (a 3D reshape of a 2D vector trips Mosaic)
    picked = jnp.where(seg_mask, full, 0.0)
    out = picked[:, 0:head_dim]
    for kv in range(1, num_kv_heads):
        out = out + picked[:, kv * head_dim:(kv + 1) * head_dim]
    o_ref[:] = out[None].astype(o_ref.dtype)
    if return_stats:
        col = jax.lax.broadcasted_iota(jnp.int32, (hq, 128), 1)
        stats = jnp.where(col == 0, m_ref[:], 0.0)
        stats = jnp.where(col == 1, l_ref[:], stats)
        stats_ref[:] = stats[None]


def _decode_kernel_tiled(
    bt_ref,  # (B, MB) int32 — scalar prefetch
    ctx_ref,  # (B,) int32 — scalar prefetch
    runs_ref,  # (B, NC) int32 — scalar prefetch
    q_ref,  # (TB, Hq, d) VMEM
    k_hbm,  # (NB*bs, Hkv*d) ANY/HBM
    v_hbm,
    o_ref,  # (TB, Hq, d) VMEM
    *rest,  # [stats_ref if return_stats] + scratch refs
    block_size: int,
    chunk_blocks: int,
    batch_tile: int,
    scale: float,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    return_stats: bool = False,
):
    """Batched-tile flash decode: one program owns TB sequences.

    The per-sequence kernel above is latency-bound at serving batch sizes:
    B sequential grid programs x L layers (measured 91 ms/iter at B=64
    ctx=2048 vs 46 for the XLA gather), each stalling on its own chunk DMAs
    around tiny (Hq, hd)x(hd, rows) matmuls. Tiling TB sequences into one
    program cuts program count TB-fold, turns the matmuls into batched
    dot_generals, and keeps all TB sequences' chunk DMAs in flight
    simultaneously."""
    if return_stats:
        stats_ref, *rest = rest
    (k_buf, v_buf, m_ref, l_ref, acc_ref,
     k_sems, v_sems, k_run_sems, v_run_sems) = rest
    tb = batch_tile
    b0 = pl.program_id(0) * tb
    nc_max = runs_ref.shape[1]
    c_rows = chunk_blocks * block_size
    hq = num_kv_heads * group
    hd = num_kv_heads * head_dim

    # tile-max chunk count bounds the fori; per-seq bounds gate each DMA
    nblk_max = jnp.int32(0)
    for s in range(tb):
        nblk_max = jnp.maximum(
            nblk_max, pl.cdiv(ctx_ref[b0 + s], jnp.int32(block_size)))
    n_chunks = pl.cdiv(nblk_max, jnp.int32(chunk_blocks))

    def dma_pair(chunk, s, cb, slot):
        bid = bt_ref[b0 + s, chunk * chunk_blocks + cb]
        kd = pltpu.make_async_copy(
            k_hbm.at[pl.ds(bid * block_size, block_size)],
            k_buf.at[slot, s, pl.ds(cb * block_size, block_size)],
            k_sems.at[slot, s, cb],
        )
        vd = pltpu.make_async_copy(
            v_hbm.at[pl.ds(bid * block_size, block_size)],
            v_buf.at[slot, s, pl.ds(cb * block_size, block_size)],
            v_sems.at[slot, s, cb],
        )
        return kd, vd

    def run_dma_pair(chunk, s, slot):
        bid0 = bt_ref[b0 + s, chunk * chunk_blocks]
        kd = pltpu.make_async_copy(
            k_hbm.at[pl.ds(bid0 * block_size, c_rows)],
            k_buf.at[slot, s],
            k_run_sems.at[slot, s],
        )
        vd = pltpu.make_async_copy(
            v_hbm.at[pl.ds(bid0 * block_size, c_rows)],
            v_buf.at[slot, s],
            v_run_sems.at[slot, s],
        )
        return kd, vd

    def for_each_dma(chunk, slot, fn):
        for s in range(tb):
            nblk_s = pl.cdiv(ctx_ref[b0 + s], jnp.int32(block_size))
            is_run = runs_ref[b0 + s, chunk % nc_max] == 1

            @pl.when((chunk * chunk_blocks < nblk_s) & is_run)
            def _():
                kd, vd = run_dma_pair(chunk, s, slot)
                fn(kd)
                fn(vd)

            for cb in range(chunk_blocks):
                @pl.when((chunk * chunk_blocks + cb < nblk_s)
                         & jnp.logical_not(is_run))
                def _():
                    kd, vd = dma_pair(chunk, s, cb, slot)
                    fn(kd)
                    fn(vd)

    def start_chunk(chunk, slot):
        for_each_dma(chunk, slot, lambda d: d.start())

    def wait_chunk(chunk, slot):
        for_each_dma(chunk, slot, lambda d: d.wait())

    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    start_chunk(0, 0)

    # zero-expanded GQA queries, batched over the tile: (TB, Hq, Hkv*d)
    q = q_ref[:]  # (TB, Hq, d)
    q_tiled = jnp.concatenate([q] * num_kv_heads, axis=2)
    col_kv = jax.lax.broadcasted_iota(jnp.int32, (hq, hd), 1) // head_dim
    row_kv = jax.lax.broadcasted_iota(jnp.int32, (hq, hd), 0) // group
    seg_mask = col_kv == row_kv
    q_exp = jnp.where(seg_mask[None], q_tiled, jnp.zeros_like(q_tiled))

    # per-seq context as a (TB, 1, 1) vector, built from SMEM scalars
    # (a (TB, 1) VMEM *input* block would trip Mosaic's (8, 128) tiling rule)
    seq_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, 1, 1), 0)
    ctx_v = jnp.zeros((tb, 1, 1), jnp.int32)
    for s in range(tb):
        ctx_v = jnp.where(seq_iota == s, ctx_ref[b0 + s], ctx_v)

    def body(chunk, _):
        slot = chunk % 2

        @pl.when(chunk + 1 < n_chunks)
        def _():
            start_chunk(chunk + 1, (chunk + 1) % 2)

        wait_chunk(chunk, slot)

        rel = ctx_v - chunk * c_rows  # (TB, 1, 1) in-context rows remaining
        row_kv_ok = (jax.lax.broadcasted_iota(
            jnp.int32, (tb, c_rows, 1), 1) < rel)
        # K needs no masking: out-of-context rows' scores (even NaN from
        # uninitialized VMEM) are REPLACED by the row_ok where below. V must
        # be zeroed - p is 0 there, but 0 * NaN would poison the accumulate.
        cdt = jnp.bfloat16 if k_buf.dtype.itemsize == 1 else k_buf.dtype
        k = k_buf[slot].astype(cdt)
        v = jnp.where(row_kv_ok, v_buf[slot],
                      jnp.zeros_like(v_buf[slot])).astype(cdt)

        # (TB, Hq, hd) x (TB, rows, hd) -> (TB, Hq, rows)
        scores = jax.lax.dot_general(
            q_exp, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        row_ok = (jax.lax.broadcasted_iota(
            jnp.int32, (tb, 1, c_rows), 2) < rel)
        scores = jnp.where(row_ok, scores, NEG_INF)

        m_prev = m_ref[:]  # (TB, Hq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        corr = jnp.where(jnp.isfinite(m_prev), corr, jnp.zeros_like(corr))
        p = jnp.exp(scores - m_new)
        p = jnp.where(row_ok, p, jnp.zeros_like(p))

        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        # (TB, Hq, rows) x (TB, rows, hd) -> (TB, Hq, hd)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    denom = jnp.maximum(l_ref[:], 1e-30)  # (TB, Hq, 1)
    full = acc_ref[:] / denom  # (TB, Hq, hd)
    picked = jnp.where(seg_mask[None], full, jnp.zeros_like(full))
    out = picked[:, :, 0:head_dim]
    for kv in range(1, num_kv_heads):
        out = out + picked[:, :, kv * head_dim:(kv + 1) * head_dim]
    o_ref[:] = out.astype(o_ref.dtype)
    if return_stats:
        col = jax.lax.broadcasted_iota(jnp.int32, (tb, hq, 128), 2)
        stats = jnp.where(col == 0, m_ref[:], 0.0)
        stats = jnp.where(col == 1, l_ref[:], stats)
        stats_ref[:] = stats


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "num_kv_heads", "chunk_blocks",
                     "batch_tile", "scale", "interpret", "return_stats"))
def paged_decode_attention_pallas(
    q: jax.Array,  # (B, Hq, d)
    k_cache: jax.Array,  # (NB, bs, HD) flat pages, HD = Hkv*d
    v_cache: jax.Array,
    block_tables: jax.Array,  # (B, MB) int32
    ctx_lens: jax.Array,  # (B,) int32
    *,
    block_size: int,
    num_kv_heads: int,
    chunk_blocks: int = 8,
    batch_tile: int = 8,
    scale: float | None = None,
    interpret: bool = False,
    return_stats: bool = False,
):
    """Returns (B, Hq, d) attention, or with ``return_stats`` a tuple
    (out, m, l) of the online-softmax running max and sum per (row, head) —
    the pieces a caller needs to flash-combine this history attention with
    extra in-band keys (ops/attention.paged_attention_window).

    ``batch_tile`` sequences share one grid program (the batched-tile
    kernel); tiles fall back to 1 when it does not divide B."""
    b, hq, d = q.shape
    nb, bs, hd = k_cache.shape
    assert bs == block_size
    hkv = num_kv_heads
    assert hd == hkv * d, (hd, hkv, d)
    g = hq // hkv
    mb = block_tables.shape[1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    c = min(chunk_blocks, mb)
    tb = batch_tile if batch_tile > 1 and b % batch_tile == 0 else 1
    # VMEM guard: K+V double-buffered chunk tiles must fit comfortably
    while tb > 1 and (2 * 2 * tb * c * bs * hd
                      * k_cache.dtype.itemsize) > 10 * 1024 * 1024:
        tb //= 2

    # lane-aligned flat ROW view (free reshape: same memory layout). The
    # kernel slices rows [bid*bs, bid*bs+bs) per page, or a whole
    # [bid0*bs, bid0*bs+C*bs) span in one DMA when a chunk's blocks are
    # physically consecutive.
    k_flat = k_cache.reshape(nb * bs, hd)
    v_flat = v_cache.reshape(nb * bs, hd)

    # per-chunk contiguity: runs[b, j] == 1 iff logical blocks
    # [j*C, (j+1)*C) are all in-context AND physically consecutive. Computed
    # in-graph from the block table (a few hundred int ops) and handed to
    # the kernel via scalar prefetch.
    nc = -(-mb // c)
    btp = jnp.pad(block_tables.astype(jnp.int32),
                  ((0, 0), (0, nc * c - mb)), constant_values=-(2 ** 20))
    btc = btp.reshape(b, nc, c)
    if c > 1:
        contig = jnp.all(btc[:, :, 1:] == btc[:, :, :-1] + 1, axis=-1)
    else:
        contig = jnp.ones((b, nc), bool)
    nblk = -(-ctx_lens.astype(jnp.int32) // jnp.int32(bs))  # (B,)
    full = (jnp.arange(nc, dtype=jnp.int32)[None] * c + c) <= nblk[:, None]
    runs = (contig & full).astype(jnp.int32)

    out_shape = [jax.ShapeDtypeStruct((b, hq, d), q.dtype)]
    if return_stats:
        out_shape.append(jax.ShapeDtypeStruct((b, hq, 128), jnp.float32))

    if tb > 1:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b // tb,),
            in_specs=[
                pl.BlockSpec((tb, hq, d), lambda i, bt, cl, rn: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=([pl.BlockSpec((tb, hq, d),
                                     lambda i, bt, cl, rn: (i, 0, 0),
                                     memory_space=pltpu.VMEM)]
                       + ([pl.BlockSpec((tb, hq, 128),
                                        lambda i, bt, cl, rn: (i, 0, 0),
                                        memory_space=pltpu.VMEM)]
                          if return_stats else [])),
            scratch_shapes=[
                pltpu.VMEM((2, tb, c * bs, hd), k_cache.dtype),
                pltpu.VMEM((2, tb, c * bs, hd), v_cache.dtype),
                pltpu.VMEM((tb, hq, 1), jnp.float32),
                pltpu.VMEM((tb, hq, 1), jnp.float32),
                pltpu.VMEM((tb, hq, hd), jnp.float32),
                pltpu.SemaphoreType.DMA((2, tb, c)),
                pltpu.SemaphoreType.DMA((2, tb, c)),
                pltpu.SemaphoreType.DMA((2, tb)),
                pltpu.SemaphoreType.DMA((2, tb)),
            ],
        )
        kernel = functools.partial(
            _decode_kernel_tiled,
            block_size=bs,
            chunk_blocks=c,
            batch_tile=tb,
            scale=float(scale),
            num_kv_heads=hkv,
            group=g,
            head_dim=d,
            return_stats=return_stats,
        )
        res = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(block_tables, ctx_lens, runs, q, k_flat, v_flat)
        if return_stats:
            out, stats = res
            return out, stats[:, :, 0], stats[:, :, 1]
        return res[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, bt, cl, rn: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=([pl.BlockSpec((1, hq, d), lambda i, bt, cl, rn: (i, 0, 0),
                                 memory_space=pltpu.VMEM)]
                   + ([pl.BlockSpec((1, hq, 128),
                                    lambda i, bt, cl, rn: (i, 0, 0),
                                    memory_space=pltpu.VMEM)]
                      if return_stats else [])),
        scratch_shapes=[
            pltpu.VMEM((2, c * bs, hd), k_cache.dtype),
            pltpu.VMEM((2, c * bs, hd), v_cache.dtype),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, hd), jnp.float32),
            pltpu.SemaphoreType.DMA((2, c)),
            pltpu.SemaphoreType.DMA((2, c)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        block_size=bs,
        chunk_blocks=c,
        scale=float(scale),
        num_kv_heads=hkv,
        group=g,
        head_dim=d,
        return_stats=return_stats,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(block_tables, ctx_lens, runs, q, k_flat, v_flat)
    if return_stats:
        out, stats = res
        return out, stats[:, :, 0], stats[:, :, 1]
    return res[0]
