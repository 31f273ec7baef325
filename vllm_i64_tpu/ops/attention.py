"""Paged attention over a block-table KV cache.

TPU-native replacement for the reference attention backends
(ref: vllm_i64/layers/attention.py — naive_varlen :123-187, naive_cached
:190-245, tensor paged decode :469-514). Semantics match naive_cached
attention: queries attend causally (k_pos <= q_pos) to the full cached
history, with optional sliding window (q_pos - k_pos < window).

Design: one fully-vectorized program for prefill and decode alike — shapes
are (B, T, ...) with T=1 for decode. K/V pages are gathered through the block
table into a dense (B, S, Hkv, d) view, masked, softmaxed in fp32. The
gather is one sequential HBM read of the context (the unavoidable cost of
decode attention); a Pallas kernel that fuses gather+attention without the
intermediate materialization is layered underneath for long contexts.
"""

from __future__ import annotations

import os as _os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")

# Decode attention path: measured on v5e (B=16, 30 layers, in the compiled
# multistep program) the XLA gather path beats the Pallas paged-decode
# kernel at EVERY context length the reference serves (ctx 128: 7.8 vs
# 10-14 ms/iter noisy but consistently ahead; ctx 512: 7.7 vs 13.6; ctx
# 2048: 22.6 vs 42.2). The kernel is DMA-issue-count-bound (~0.8 us per
# page DMA on the scalar core, B*pages*2 DMAs per layer) while XLA emits
# one large vectorized gather. Kernel retained for experimentation.
_PALLAS_DECODE = False
# Window-RMW decode KV write kernel (ops/kv_write_pallas.py). Standalone it
# beats the XLA scatter 4x (6.4 vs 25 ms for 30 layers x 64 rows), but
# measured IN the compiled step program the two are within 0.3% at B=16 and
# B=64 — XLA schedules the in-context scatter far better than it does a
# bare one — while the kernel's programs compile ~6x slower through the
# remote-compile tunnel. Off by default; flip for shapes where the scatter
# regresses.
_PALLAS_KV_WRITE = False
# Prefill dispatch: the XLA gather path materializes the (B, Hkv, G, T, S)
# fp32 score tensor — its HBM traffic scales with T*S — while the flash
# kernel streams K/V pages once and keeps O(T*d) state. Measured in-scan on
# v5e (2026-08-20, tools/tpu_prefill_vmem_repro.py): flash wins 2.3x at
# B=16 T=512 S=2048 (3.06 vs 6.97 ms/layer), 1.9x at T=128 S=2048, 1.2x at
# T=512 S=512, and only loses at T=128 S=128 (0.91x). Dispatch rule: flash
# when the query chunk is tile-aligned and the block-table span is >= 512
# tokens.
_PALLAS_PREFILL_MIN_T = 128
_PALLAS_PREFILL_MIN_SPAN = int(_os.environ.get(
    "VLLM_I64_TPU_FLASH_PREFILL_MIN_SPAN", "512"))
# XLA-TPU stack-allocates the pallas call's full q input and output in
# scoped VMEM whenever the call sits inside a lax.scan body (the layer
# stack) — with the default 16 MB scoped limit the kernel failed to compile
# at serving shapes (round 3: "Scoped allocation 22.43M ... exceeded scoped
# vmem limit"; explicit HBM out_specs / memory-space constraints do not
# move the RESULT buffer). The fix (round 4): the engine compiles its step
# programs with xla_tpu_scoped_vmem_limit_kib raised to 98 MB
# (engine/runner.SCOPED_VMEM_LIMIT_KIB) and tells this module the budget it
# bought via set_prefill_staging_budget(); the dispatch gate below admits
# the kernel only when q + out staging fits. Standalone callers without the
# raised limit keep the conservative 8 MB default.
_PALLAS_PREFILL = True
_PREFILL_STAGING_BUDGET = 8 * 1024 * 1024


def set_prefill_staging_budget(nbytes: int) -> None:
    """Declare how much scoped VMEM the compiled program may stack-allocate
    for the flash-prefill q/out staging (call before tracing)."""
    global _PREFILL_STAGING_BUDGET
    _PREFILL_STAGING_BUDGET = int(nbytes)


_WARNED_ENVS: set = set()


def _env_flag(name: str):
    """Read a "0"/"1" env override; warn ONCE on unrecognized values.

    NOTE: all VLLM_I64_TPU_* attention flags are captured at TRACE time —
    jitted step programs bake the value in at first compilation, so changing
    them later in a process has no effect until new shapes compile.
    """
    import logging
    import os

    env = os.environ.get(name)
    if env is None or env in ("0", "1"):
        return env
    if name not in _WARNED_ENVS:
        _WARNED_ENVS.add(name)
        logging.getLogger("vllm_i64_tpu.attention").warning(
            "%s=%r is not '0' or '1' — ignored (flags are also captured at "
            "first trace; set them before the process compiles any step)",
            name, env)
    return None


def _use_pallas_prefill() -> bool:
    # env override mirrors the reference's VLLM_NO_FLASH_ATTN escape hatch
    # (ref: layers/attention.py:28-29): "0" disables, "1" forces on
    env = _env_flag("VLLM_I64_TPU_PALLAS_PREFILL")
    if env is not None:
        if env == "0":
            return False
    elif not _PALLAS_PREFILL:
        return False
    if _interpret_kernels():
        return True  # CPU-mesh validation runs the kernel in interpret mode
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


# Deferred-window decode history path: stream cache pages through the
# batched-tile Pallas flash-decode kernel (with softmax stats out) and
# combine with the in-band window in XLA, instead of the dense gather of
# the whole history. v5e A/B (B=64, 30 layers, in the compiled multistep
# window, 2026-08-19): ctx 128: gather 8.1 vs flash 9.0 ms/iter; ctx 512:
# 10.7 vs 12.1; ctx 2048: 45.6 vs 33.5 — flash wins long context. The
# gather's cost scales with the STATIC block-table width (it always reads
# every padded slab) while the kernel's scales with the ACTUAL context, so
# the auto policy keys on the table's token span: None = auto (flash when
# the bucket spans >= _FLASH_WINDOW_MIN_CTX tokens), True/False = forced
# (VLLM_I64_TPU_PALLAS_WINDOW=1/0 overrides).
_PALLAS_WINDOW_DECODE: Optional[bool] = None
_FLASH_WINDOW_MIN_CTX = 1024


def _use_pallas_window_decode(max_ctx_tokens: int) -> bool:
    env = _env_flag("VLLM_I64_TPU_PALLAS_WINDOW")
    if env == "0":
        return False
    if env != "1":
        if _PALLAS_WINDOW_DECODE is False:
            return False
        if (_PALLAS_WINDOW_DECODE is None
                and max_ctx_tokens < _FLASH_WINDOW_MIN_CTX):
            return False
    if _interpret_kernels():
        return True  # CPU-mesh validation runs the kernel in interpret mode
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _use_pallas_decode() -> bool:
    if not _PALLAS_DECODE:
        return False
    try:
        import jax as _jax

        return _jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def kv_cache_slots(
    block_tables: jax.Array,  # (B, MB) int32 physical block ids
    positions: jax.Array,  # (B, T) int32 token positions
    block_size: int,
    valid: Optional[jax.Array] = None,  # (B, T) bool
) -> jax.Array:
    """Flat cache-slot index per token: block_table[pos // bs] * bs + pos % bs.

    Invalid tokens map to a huge out-of-range slot so scatter `mode=drop`
    discards them (the CUDA-graph-safe analog of ref kv_cache.py:422-459's
    tensor-only decode write).
    """
    block_idx = positions // block_size
    offset = positions % block_size
    phys = jnp.take_along_axis(block_tables, block_idx, axis=1)
    slots = phys.astype(jnp.int32) * block_size + offset
    if valid is not None:
        slots = jnp.where(valid, slots, jnp.int32(2**30))
    return slots


def write_kv(
    k_cache: jax.Array,  # (NB, bs, HD) — flat pages, HD = Hkv*d
    v_cache: jax.Array,
    k: jax.Array,  # (B, T, Hkv, d)
    v: jax.Array,
    block_tables: jax.Array,  # (B, MB)
    positions: jax.Array,  # (B, T)
    valid: Optional[jax.Array] = None,  # (B, T) bool
    *,
    block_aligned: bool = False,
):
    """Scatter new K/V rows into the paged cache. Returns updated caches.

    Functional update — callers donate the cache buffers so XLA performs the
    scatter in place (no copy of the multi-hundred-MB cache per step).

    The cache stores pages FLAT: (NB, bs, Hkv*d). The trailing (bs=128,
    HD=256) dims tile the TPU's native (8, 128) exactly, so one row-major
    layout serves every consumer — the 5D (.., Hkv=4, d=64) shape could
    never tile and cost a whole-cache relayout copy somewhere in each program
    (r5 decode trace). Scatters write (HD,) token rows or whole page
    images; readers gather (bs, HD) pages.
    """
    nb, bs, hd = k_cache.shape
    t = k.shape[1]
    b = k.shape[0]
    k = k.reshape(b, t, hd)
    v = v.reshape(b, t, hd)
    if block_aligned and t % bs == 0 and t >= bs:
        # Prefill fast path. CONTRACT (checked by the host gate in
        # engine/runner.execute before setting the flag): per row, valid
        # tokens form a contiguous PREFIX, their positions are contiguous
        # and start on a block boundary, and the valid count is a whole
        # number of blocks — so rows write ENTIRE cache blocks. One scatter of
        # B*W block images replaces the B*T row scatter that serializes on
        # TPU (~8 ms of a 50 ms 16x128 prefill dispatch on v5e). Distinct
        # rows always target distinct blocks (block tables are per-sequence
        # exclusive; packed subrows of one request cover disjoint
        # block-aligned token ranges).
        w = t // bs
        img_k = k.reshape(b, w, bs, hd).astype(k_cache.dtype)
        img_v = v.reshape(b, w, bs, hd).astype(v_cache.dtype)
        start_blk = positions[:, 0] // bs  # (B,)
        wi = jnp.arange(w, dtype=jnp.int32)
        mb = block_tables.shape[1]
        blk = start_blk[:, None] + wi[None]
        phys = jnp.take_along_axis(
            block_tables, jnp.clip(blk, 0, mb - 1), axis=1
        ).astype(jnp.int32)
        if valid is not None:
            nrow = jnp.sum(valid.astype(jnp.int32), axis=1)
        else:
            nrow = jnp.full((b,), t, jnp.int32)
        wr = nrow // bs  # whole blocks actually covered per row
        dst = jnp.where(wi[None] < wr[:, None], phys, jnp.int32(2**30))
        k_cache = k_cache.at[dst.reshape(-1)].set(
            img_k.reshape(-1, bs, hd), mode="drop")
        v_cache = v_cache.at[dst.reshape(-1)].set(
            img_v.reshape(-1, bs, hd), mode="drop")
        return k_cache, v_cache
    if (
        t == 1
        and bs % 8 == 0
        and hd % 128 == 0
        and k_cache.dtype.itemsize >= 2  # 1-byte dtypes tile (32, 128)
        and _PALLAS_KV_WRITE
        and _use_pallas_decode()
    ):
        from .kv_write_pallas import kv_write_decode_pallas

        slots_b = kv_cache_slots(block_tables, positions, bs, valid)[:, 0]
        return kv_write_decode_pallas(
            k_cache, v_cache, k[:, 0], v[:, 0], slots_b
        )
    slots = kv_cache_slots(block_tables, positions, bs, valid).reshape(-1)
    k_flat = k.reshape(-1, hd).astype(k_cache.dtype)
    v_flat = v.reshape(-1, hd).astype(v_cache.dtype)
    k_cache = k_cache.reshape(nb * bs, hd).at[slots].set(k_flat, mode="drop")
    v_cache = v_cache.reshape(nb * bs, hd).at[slots].set(v_flat, mode="drop")
    return k_cache.reshape(nb, bs, hd), v_cache.reshape(nb, bs, hd)


def gather_kv(
    k_cache: jax.Array,  # (NB, bs, HD) flat pages
    v_cache: jax.Array,
    block_tables: jax.Array,  # (B, MB)
):
    """Gather the paged context into dense FLAT (B, MB*bs, HD) views.

    mode="clip" matters: jnp.take's default out-of-bounds fill semantics
    make XLA materialize a fill-value broadcast of the ENTIRE cache shape
    (500 MB) alongside the gather. Block tables only ever hold valid
    physical ids (padding rows point at the null block 0), so clamping is
    free and exact.
    """
    nb, bs, hd = k_cache.shape
    k = jnp.take(k_cache, block_tables, axis=0, mode="clip")
    v = jnp.take(v_cache, block_tables, axis=0, mode="clip")
    b, mb = block_tables.shape
    return k.reshape(b, mb * bs, hd), v.reshape(b, mb * bs, hd)


def _block_diag_q(q: jax.Array, hkv: int) -> jax.Array:
    """(B, Hq, d) query -> (B, HD, Hq) block-diagonal operand.

    Lets decode attention run ONE dot against the FLAT (B, S, HD) gathered
    pages with no transpose of the S-major data: scores[b, s, h*g+j] =
    sum_d q[b, h*g+j, d] * k_flat[b, s, h*d + d'] restricted to the head's
    own d-columns. The off-block zeros waste (Hkv x) MXU work — free at
    decode, where the MXU is idle — and buy a zero-relayout data path
    (r5 probe: 114.7 -> 42.9 us/layer at B=64 ctx 256).
    """
    b, hq, d = q.shape
    g = hq // hkv
    qr = q.reshape(b, hkv, g, d)
    qbd = jnp.zeros((b, hkv, d, hkv, g), q.dtype)
    ii = jnp.arange(hkv)
    qbd = qbd.at[:, ii, :, ii].set(qr.transpose(1, 0, 3, 2))
    return qbd.reshape(b, hkv * d, hq)


def _block_diag_extract(out_flat: jax.Array, hkv: int, d: int) -> jax.Array:
    """(B, Hq, HD) block-diag dot output -> (B, Hq, d) per-head slices."""
    b, hq = out_flat.shape[:2]
    g = hq // hkv
    od = out_flat.reshape(b, hkv, g, hkv, d)
    eye = jnp.eye(hkv, dtype=out_flat.dtype)
    return jnp.einsum("bhgid,hi->bhgd", od, eye).reshape(b, hq, d)



def _attn_softmax(scores: jax.Array, integer: bool) -> jax.Array:
    """Safe fp32 softmax, or the Q7/Q16 LUT integer softmax (the reference's
    integer attention keeps scores and V in float and swaps ONLY the softmax:
    ref attention.py:265-466 naive_integer_* + moe.py softmax_integer).
    The integer path pairs with -1e4 masks (Q7: -1e4*128 clamps to the LUT
    minimum; -inf would overflow the int32 quantize)."""
    if integer:
        from .integer import softmax_integer

        return softmax_integer(scores, axis=-1)
    smax = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), -1e30)
    unnorm = jnp.exp(scores - smax)
    return unnorm / jnp.maximum(jnp.sum(unnorm, axis=-1, keepdims=True), 1e-30)


def paged_attention(
    q: jax.Array,  # (B, T, Hq, d) — T=1 for decode
    k_cache: jax.Array,  # (NB, bs, HD) flat pages, HD = Hkv*d
    v_cache: jax.Array,
    block_tables: jax.Array,  # (B, MB)
    positions: jax.Array,  # (B, T) int32 query positions
    ctx_lens: jax.Array,  # (B,) int32 total tokens (incl. current) per seq
    *,
    scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    integer_softmax: bool = False,
) -> jax.Array:
    """Causal attention of q against the cached history (which must already
    contain the current tokens — write_kv runs first, matching ref
    model.py:203-236 write-then-read ordering). Returns (B, T, Hq, d)."""
    b, t, hq, d = q.shape
    hkv_d = k_cache.shape[2]
    hkv = hkv_d // d
    g = hq // hkv

    # decode fast path: stream pages HBM->VMEM in the Pallas kernel instead
    # of materializing the dense gathered context. Requires a lane-aligned
    # flat page row (Hkv*d % 128 == 0, true for the production models'
    # 4 kv-heads x 64 d) — Mosaic cannot DMA-slice misaligned minor dims.
    if (
        t == 1
        and sliding_window is None
        and not integer_softmax
        and hkv_d % 128 == 0
        and k_cache.shape[1] % 8 == 0
        # 1-byte (fp8) caches tile (32, 128): a bs=16 per-page DMA slice
        # would fail Mosaic — same gate as write_kv (:201) and the window
        # path (:450); the gather path serves fp8 caches
        and k_cache.dtype.itemsize >= 2
        and _use_pallas_decode()
    ):
        from .paged_attention_pallas import paged_decode_attention_pallas

        out = paged_decode_attention_pallas(
            q[:, 0], k_cache, v_cache, block_tables, ctx_lens,
            block_size=k_cache.shape[1], num_kv_heads=hkv, scale=scale,
        )
        return out[:, None]
    # chunked-prefill flash kernel instead of dense gather + (T, S) scores.
    # Requires the engine's chunked-prefill layout (contiguous per-row query
    # positions) and lane-aligned pages. Wins at every measured serving
    # shape with a context span >= 512 tokens (see _PALLAS_PREFILL above).
    if (
        t >= _PALLAS_PREFILL_MIN_T
        and t % 128 == 0
        and block_tables.shape[1] * k_cache.shape[1] >= _PALLAS_PREFILL_MIN_SPAN
        and sliding_window is None
        and not integer_softmax
        and hkv_d % 128 == 0
        and k_cache.shape[1] % 8 == 0
        # q + out staging must fit the scoped-VMEM budget the compiling
        # program declared (set_prefill_staging_budget)
        and 2 * b * t * hq * d * q.dtype.itemsize <= _PREFILL_STAGING_BUDGET
        and _use_pallas_prefill()
    ):
        from .prefill_attention_pallas import paged_prefill_attention_pallas

        return paged_prefill_attention_pallas(
            q, k_cache, v_cache, block_tables, positions, ctx_lens,
            block_size=k_cache.shape[1], num_kv_heads=hkv, scale=scale,
            interpret=_interpret_kernels(),
        )
    if scale is None:
        scale = 1.0 / (d**0.5)

    k, v = gather_kv(k_cache, v_cache, block_tables)  # (B, S, HD) flat
    s = k.shape[1]
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)

    if t == 1 and not integer_softmax:
        # decode: block-diagonal flat formulation — both attention dots
        # consume the gathered pages EXACTLY as laid out (S-major rows),
        # no transpose/relayout of the 8+ MB context per layer
        qbd = _block_diag_q(q[:, 0], hkv)  # (B, HD, Hq)
        sc = jnp.einsum(
            "bsf,bfh->bsh", k, qbd, preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        mask = (k_pos <= positions[:, 0][:, None]) \
            & (k_pos < ctx_lens[:, None])
        if sliding_window is not None:
            mask &= (positions[:, 0][:, None] - k_pos) < sliding_window
        sc = jnp.where(mask[:, :, None], sc, NEG_INF)
        smax = jnp.maximum(jnp.max(sc, axis=1, keepdims=True), -1e30)
        un = jnp.exp(sc - smax)
        p = un / jnp.maximum(jnp.sum(un, axis=1, keepdims=True), 1e-30)
        out_flat = jnp.einsum(
            "bsh,bsf->bhf", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )  # (B, Hq, HD)
        return _block_diag_extract(out_flat, hkv, d)[:, None].astype(q.dtype)

    k = k.reshape(b, s, hkv, d)
    v = v.reshape(b, s, hkv, d)
    qg = q.reshape(b, t, hkv, g, d)
    # scores: (B, Hkv, g, T, S) in fp32
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)

    q_pos = positions  # (B, T)
    mask = k_pos[:, None, :] <= q_pos[:, :, None]  # causal, (B, T, S)
    mask &= k_pos[:, None, :] < ctx_lens[:, None, None]
    if sliding_window is not None:
        mask &= (q_pos[:, :, None] - k_pos[:, None, :]) < sliding_window

    fill = jnp.float32(-1e4) if integer_softmax else NEG_INF
    scores = jnp.where(mask[:, None, None, :, :], scores, fill)
    # Safe softmax: fully-masked (padding) rows produce zeros, not NaN.
    probs = _attn_softmax(scores, integer_softmax)

    out = jnp.einsum(
        "bhgts,bshd->bthgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, t, hq, d).astype(q.dtype)


def _mesh_and_tp():
    """(mesh, tp_size) from the runner-set dispatch mesh (None, 1 single-chip).

    The KV cache and attention heads shard over the mesh's "tp" axis
    (parallel/mesh.kv_cache_spec); Pallas kernels are single-device programs,
    so under a mesh they run inside shard_map over that axis.
    """
    from .ep_dispatch import get_ep_mesh

    mesh = get_ep_mesh()
    if mesh is None:
        return None, 1
    try:
        tp = int(mesh.shape["tp"])
    except Exception:
        tp = 1
    return mesh, tp


def _interpret_kernels() -> bool:
    """Force Pallas interpret mode (CPU-mesh validation, e.g. the driver
    dry-run proving the shard_map-wrapped kernels compile + execute)."""
    import os

    return os.environ.get("VLLM_I64_TPU_PALLAS_INTERPRET") == "1"


def _window_attention_flash(
    q: jax.Array,  # (B, 1, Hq, d)
    k_cache: jax.Array,  # (NB, bs, HD) flat pages
    v_cache: jax.Array,
    block_tables: jax.Array,  # (B, MB)
    ctx0: jax.Array,  # (B,) cache-resident tokens (may be -1 on pad rows)
    win_k: jax.Array,  # (B, K, HD) flat
    win_v: jax.Array,
    k_idx: jax.Array,  # scalar i32
    *,
    num_kv_heads: int,
    scale: float,
) -> jax.Array:
    """paged_attention_window via the Pallas flash-decode kernel: history
    attention + (m, l) stats from the kernel, in-band window part in XLA,
    exact online-softmax combination of the two.

    Under a device mesh the kernel runs inside shard_map over the "tp"
    axis (heads shard; every other mesh axis sees replicated data) — the
    kernel body is unchanged, each device streams only its local KV heads'
    pages (VERDICT r2: the mesh path previously stripped this kernel and
    served the slowest configuration).
    """
    from .paged_attention_pallas import paged_decode_attention_pallas

    b, t, hq, d = q.shape
    hkv = num_kv_heads
    g = hq // hkv
    kwin = win_k.shape[1]

    import os

    _tb = int(os.environ.get("VLLM_I64_TPU_FLASH_TB", "8"))
    _cb = int(os.environ.get("VLLM_I64_TPU_FLASH_CHUNK", "4"))

    mesh, tp = _mesh_and_tp()

    def history(q3, kc, vc, bt, c0):
        return paged_decode_attention_pallas(
            q3, kc, vc, bt, c0, block_size=k_cache.shape[1],
            num_kv_heads=hkv // tp if mesh is not None else hkv,
            chunk_blocks=_cb, batch_tile=_tb,
            scale=scale, return_stats=True,
            interpret=_interpret_kernels(),
        )

    if mesh is None or tp == 1:
        out_h, m_h, l_h = history(
            q[:, 0], k_cache, v_cache, block_tables, jnp.maximum(ctx0, 0))
    else:
        from jax.sharding import PartitionSpec as P

        hs = P(None, "tp", None)  # (B, Hq_local, d)
        out_h, m_h, l_h = jax.shard_map(
            history,
            mesh=mesh,
            in_specs=(hs, P(None, None, "tp"),
                      P(None, None, "tp"), P(), P()),
            out_specs=(hs, P(None, "tp"), P(None, "tp")),
            check_vma=False,
        )(q[:, 0], k_cache, v_cache, block_tables, jnp.maximum(ctx0, 0))
    # (B, Hq, d), (B, Hq), (B, Hq)

    qg = q.reshape(b, t, hkv, g, d)
    wk = win_k.reshape(b, kwin, hkv, d)
    wv = win_v.reshape(b, kwin, hkv, d)
    scores_w = jnp.einsum(
        "bthgd,bjhd->bhgtj", qg, wk, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)  # (B, Hkv, G, 1, K)
    j_pos = jnp.arange(kwin, dtype=jnp.int32)
    mask_w = j_pos <= k_idx
    scores_w = jnp.where(mask_w[None, None, None, None, :], scores_w, NEG_INF)

    m_w = jnp.max(scores_w, axis=-1)  # (B, Hkv, G, 1)
    p_w = jnp.exp(scores_w - m_w[..., None])
    p_w = jnp.where(mask_w[None, None, None, None, :], p_w, 0.0)
    l_w = jnp.sum(p_w, axis=-1)  # (B, Hkv, G, 1)
    out_w = jnp.einsum(
        "bhgtj,bjhd->bhgtd", p_w.astype(jnp.float32),
        wv.astype(jnp.float32), preferred_element_type=jnp.float32,
    )  # (B, Hkv, G, 1, d) — UNNORMALIZED (sum p_w · v)

    # combine: heads are laid out h = kv_head * g + g_idx in q's Hq axis
    m_h = m_h.reshape(b, hkv, g, 1)
    l_h = l_h.reshape(b, hkv, g, 1)
    o_h = out_h.reshape(b, hkv, g, 1, d).astype(jnp.float32)

    m_t = jnp.maximum(m_h, m_w)
    alpha = jnp.where(jnp.isfinite(m_h), jnp.exp(m_h - m_t), 0.0)
    beta = jnp.where(jnp.isfinite(m_w), jnp.exp(m_w - m_t), 0.0)
    denom = jnp.maximum(alpha * l_h + beta * l_w, 1e-30)
    out = (alpha[..., None] * l_h[..., None] * o_h
           + beta[..., None] * out_w) / denom[..., None]
    return out.reshape(b, hkv, g, d).reshape(b, t, hq, d).astype(q.dtype)


def paged_attention_window(
    q: jax.Array,  # (B, 1, Hq, d) — decode only
    k_cache: jax.Array,  # (NB, bs, HD) flat pages — history through ctx0
    v_cache: jax.Array,
    block_tables: jax.Array,  # (B, MB)
    ctx0: jax.Array,  # (B,) tokens in the CACHE (window-start context)
    win_k: jax.Array,  # (B, K, HD) — this window's deferred K rows, flat
    win_v: jax.Array,
    k_idx: jax.Array,  # scalar i32 — current iteration within the window
    *,
    scale: Optional[float] = None,
    integer_softmax: bool = False,
) -> jax.Array:
    """Decode attention with deferred KV writes.

    The paged cache holds only tokens written BEFORE this multistep window;
    the window's own tokens (including the current one) live in the
    ``win_k/win_v`` side buffers and attend in-band. This removes the
    per-layer scatter->gather serialization of write-then-read decode (the
    cache is merged once per window, see ModelRunner._multi_decode_impl);
    semantics match paged_attention over a cache containing ctx0 + k_idx + 1
    tokens. Window entries j > k_idx are masked (stale or future).
    """
    b, t, hq, d = q.shape
    hd = k_cache.shape[2]
    hkv = hd // d
    g = hq // hkv
    kwin = win_k.shape[1]
    if scale is None:
        scale = 1.0 / (d**0.5)

    # flash path: stream history pages through the Pallas decode kernel
    # (each context byte read once, no dense gather materialization) and
    # flash-combine with the in-band window via the kernel's (m, l) stats.
    # Under a mesh the kernel runs shard_mapped over the "tp" axis, so the
    # alignment gates apply to the PER-DEVICE shard (heads divide tp; a
    # device's flat page row (Hkv/tp)*d stays lane-aligned).
    _mesh, _tp = _mesh_and_tp()
    hkv_d_local = hd // max(_tp, 1)
    if (
        t == 1
        and not integer_softmax
        and hkv % _tp == 0
        and hq % _tp == 0
        and hkv_d_local % 128 == 0
        and k_cache.shape[1] % 8 == 0
        # fp8 KV loses in the kernel (59 vs XLA's 32.3 ms/iter at ctx 2048
        # on v5e — the per-chunk upcast pass over K/V dominates); the
        # gather path handles the auto-upgraded-fp8 cache instead
        and k_cache.dtype.itemsize >= 2
        and _use_pallas_window_decode(
            block_tables.shape[1] * k_cache.shape[1])
    ):
        return _window_attention_flash(
            q, k_cache, v_cache, block_tables, ctx0, win_k, win_v, k_idx,
            num_kv_heads=hkv, scale=scale,
        )

    k, v = gather_kv(k_cache, v_cache, block_tables)  # (B, S, HD) flat
    s = k.shape[1]
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    mask_h = k_pos < ctx0[:, None]  # strictly historical, (B, S)
    j_pos = jnp.arange(kwin, dtype=jnp.int32)
    mask_w = j_pos <= k_idx  # (K,) — causal within the window

    if t == 1 and not integer_softmax:
        # block-diagonal flat formulation: history AND window scores from
        # one dot each against the flat (.., HD) buffers, one softmax over
        # the concatenated (small) score tensor, combine outputs flat and
        # extract the per-head diagonal once (see _block_diag_q)
        qbd = _block_diag_q(q[:, 0], hkv)  # (B, HD, Hq)
        sc_h = jnp.einsum(
            "bsf,bfh->bsh", k, qbd, preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        sc_h = jnp.where(mask_h[:, :, None], sc_h, NEG_INF)
        sc_w = jnp.einsum(
            "bjf,bfh->bjh", win_k, qbd, preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        sc_w = jnp.where(mask_w[None, :, None], sc_w, NEG_INF)
        sc = jnp.concatenate([sc_h, sc_w], axis=1)  # (B, S+K, Hq)
        smax = jnp.maximum(jnp.max(sc, axis=1, keepdims=True), -1e30)
        un = jnp.exp(sc - smax)
        p = un / jnp.maximum(jnp.sum(un, axis=1, keepdims=True), 1e-30)
        out_flat = jnp.einsum(
            "bsh,bsf->bhf", p[:, :s].astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "bjh,bjf->bhf", p[:, s:].astype(win_v.dtype), win_v,
            preferred_element_type=jnp.float32,
        )
        return _block_diag_extract(out_flat, hkv, d)[:, None].astype(q.dtype)

    k = k.reshape(b, s, hkv, d)
    v = v.reshape(b, s, hkv, d)
    wk = win_k.reshape(b, kwin, hkv, d)
    wv = win_v.reshape(b, kwin, hkv, d)
    qg = q.reshape(b, t, hkv, g, d)

    scores_h = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    fill = jnp.float32(-1e4) if integer_softmax else NEG_INF
    scores_h = jnp.where(mask_h[:, None, None, None, :], scores_h, fill)

    scores_w = jnp.einsum(
        "bthgd,bjhd->bhgtj", qg, wk, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    scores_w = jnp.where(mask_w[None, None, None, None, :], scores_w, fill)

    scores = jnp.concatenate([scores_h, scores_w], axis=-1)
    probs = _attn_softmax(scores, integer_softmax)

    out = jnp.einsum(
        "bhgts,bshd->bthgd", probs[..., :s].astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "bhgtj,bjhd->bthgd", probs[..., s:].astype(wv.dtype), wv,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, t, hq, d).astype(q.dtype)


def _merge_sub_rows(kwin: int, bs: int) -> int:
    """Sub-slab row granularity for merge_window_kv.

    On the OLD 5D cache layout whole-block was fastest (r4 A/B: s=16 paid
    1.68 vs 1.08 ms/iter — the scatter's per-update overhead dominated on
    the untileable (Hkv, d) trailing dims). On the FLAT page layout the
    balance flips completely: the whole-block blend materialized two
    128-row block images per row (126 MB of traffic to land <= 16 tokens)
    while the flat sub-slab scatter writes tile-aligned (s, HD) rows —
    measured r5 (v5e, B=64 K=16 bs=128, decode trace): merge chain
    10.4 -> 0.69 ms per window at s=K. Default: the window length.
    VLLM_I64_TPU_MERGE_SUB_ROWS overrides for A/B (0 = whole-block)."""
    import os

    env = os.environ.get("VLLM_I64_TPU_MERGE_SUB_ROWS")
    if env is not None:
        n = int(env)
        return bs if n <= 0 else min(n, bs)
    # power-of-two >= kwin that divides bs (kwin is 16 in production;
    # odd window lengths fall back to whole-block)
    s = 1
    while s < min(kwin, bs):
        s *= 2
    return s if bs % s == 0 else bs


def merge_window_kv(
    k_cache: jax.Array,  # (L, NB, bs, HD) flat pages, all layers
    v_cache: jax.Array,
    win_k: jax.Array,  # (L, B, K, HD) flat
    win_v: jax.Array,
    block_tables: jax.Array,  # (B, MB)
    ctx0: jax.Array,  # (B,) window-start context
    steps_taken: jax.Array,  # (B,) active iterations this window
    *,
    sub_rows: Optional[int] = None,
):
    """Land a whole multistep window's K/V (all layers) in the paged cache.

    A row scatter of L*B*K individual (Hkv, d) rows serializes on TPU
    (measured ~3.2 ms per iteration amortized at L=30, B=16, K=16 — half
    the decode step). Whole-BLOCK images fixed the serialization but blended
    and scattered bs=128 rows to land a <=16-token window — an 8x traffic
    overshoot. The cache is therefore viewed at SUB-SLAB granularity
    (``sub_rows`` S, a power of two dividing the block size, default ~K):
    the window's tokens blend into L*B*W sub-slab images with
    W = ceil((K-1)/S)+1, and one scatter per cache lands them. Sub-slab
    indices map through the block table (pos // bs picks the block,
    (pos % bs) // S the slab inside it), so windows crossing block
    boundaries work unchanged.

    Non-covered rows of the slab holding ctx0 keep their current cache
    content (gathered first — program order keeps read-before-write in one
    jit); later slabs start past everything earlier windows wrote, so their
    padding rows are never-read and zeros suffice. Entries beyond a row's
    active steps (frozen/padding rows) drop via an out-of-range destination.
    """
    l, nb, bs, hd = k_cache.shape
    b, kwin = win_k.shape[1], win_k.shape[2]
    mb = block_tables.shape[1]
    s = sub_rows or _merge_sub_rows(kwin, bs)
    if bs % s:
        raise ValueError(f"sub_rows {s} must divide block_size {bs}")
    spb = bs // s  # sub-slabs per block
    w = (kwin - 1) // s + 2  # sub-slabs a window can touch per row

    start_sub = ctx0 // s  # (B,) sequence-relative sub-slab index
    off0 = ctx0 % s
    wi = jnp.arange(w, dtype=jnp.int32)
    sub_idx = start_sub[:, None] + wi[None]  # (B, W)
    blk_idx = sub_idx // spb
    phys_blk = jnp.take_along_axis(
        block_tables, jnp.clip(blk_idx, 0, mb - 1), axis=1
    ).astype(jnp.int32)
    phys = phys_blk * spb + sub_idx % spb  # (B, W) flat sub-slab ids

    r = jnp.arange(s, dtype=jnp.int32)
    j = wi[None, :, None] * s + r[None, None, :] - off0[:, None, None]
    valid = (j >= 0) & (j < steps_taken[:, None, None])  # (B, W, s)
    any_valid = valid.any(-1)  # (B, W)
    jc = jnp.clip(j, 0, kwin - 1)

    def blend(cache, win):
        img = jnp.take_along_axis(
            win[:, :, None], jc[None, :, :, :, None], axis=3
        )  # (L, B, W, s, HD)
        # only slab 0 (the one holding ctx0) can contain real history —
        # slabs w >= 1 start at (start_sub+1)*s >= ctx0, past everything any
        # earlier window wrote, so their non-covered rows are never-read
        # padding and zeros are as good as a gather
        cur0 = jnp.take(
            cache.reshape(l, nb * spb, s, hd), phys[:, 0], axis=1,
            mode="clip",
        )[:, :, None]
        cur = jnp.concatenate(
            [cur0, jnp.zeros((l, b, w - 1, s, hd), cache.dtype)], axis=2)
        return jnp.where(
            valid[None, :, :, :, None], img.astype(cache.dtype), cur)

    dst = jnp.where(any_valid, phys, jnp.int32(2**30))  # (B, W)
    lay = jnp.arange(l, dtype=jnp.int32)[:, None, None] * (nb * spb)
    flat = jnp.minimum(lay + dst[None], jnp.int32(2**30)).reshape(-1)

    kf = k_cache.reshape(l * nb * spb, s, hd)
    vf = v_cache.reshape(l * nb * spb, s, hd)
    kf = kf.at[flat].set(
        blend(k_cache, win_k).reshape(-1, s, hd), mode="drop")
    vf = vf.at[flat].set(
        blend(v_cache, win_v).reshape(-1, s, hd), mode="drop")
    return kf.reshape(l, nb, bs, hd), vf.reshape(l, nb, bs, hd)


def varlen_self_attention(
    q: jax.Array,  # (B, T, Hq, d)
    k: jax.Array,  # (B, T, Hkv, d)
    v: jax.Array,
    seq_lens: jax.Array,  # (B,) valid token counts
    *,
    scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    integer_softmax: bool = False,
) -> jax.Array:
    """Cache-free causal self-attention (ref naive_varlen_attention
    :123-187) for standalone model forward / parity tests."""
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    if scale is None:
        scale = 1.0 / (d**0.5)

    qg = q.reshape(b, t, hkv, g, d)
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)

    pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    mask = kpos <= pos
    if sliding_window is not None:
        mask &= (pos - kpos) < sliding_window
    mask = mask[None] & (
        jax.lax.broadcasted_iota(jnp.int32, (b, t), 1) < seq_lens[:, None]
    )[:, None, :]

    fill = jnp.float32(-1e4) if integer_softmax else NEG_INF
    scores = jnp.where(mask[:, None, None, :, :], scores, fill)
    probs = _attn_softmax(scores, integer_softmax)
    out = jnp.einsum(
        "bhgts,bshd->bthgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, t, hq, d).astype(q.dtype)
