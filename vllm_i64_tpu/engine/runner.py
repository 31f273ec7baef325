"""ModelRunner: owns device state and the compiled step programs.

The TPU replacement for the reference's CUDA-graph machinery
(ref: core/cuda_graph.py — capture per batch size {1..64} and replay into
static buffers): under XLA, *bucketed static shapes* give the same
零-dispatch-overhead property. Each (kind, batch, tokens, blocks) bucket is
one jit-compiled program, cached by XLA; the engine rounds every scheduled
batch up to the nearest bucket and pads.

One device dispatch per step: model forward + last-token logits + on-device
sampling + KV/count updates are a single donated-buffer program, so the KV
cache (hundreds of MB) is updated in place and only the sampled token ids
(B int32) return to the host.
"""

from __future__ import annotations

import functools
import logging
import threading
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, ModelConfig
from ..core.sampling import SamplerFeatures, sample_tokens
from ..models import complexity_deep as cdm

# the TWO sampler families prefill programs compile with (see
# ModelRunner.execute). A prefill step samples once per request amortized
# over a whole chunk of forward compute, so per-subset specializations buy
# nothing — but the feature axis multiplied the (batch x token x block x
# aligned) prefill program space in warmup. Greedy batches keep the cheap
# argmax-only program (the B x V Gumbel draw + three vocab sorts of the
# generic family cost ~40 ms per prefill dispatch AND triple its remote
# compile time); penalties/min_tokens ride along as exact neutral no-ops.
PREFILL_GREEDY_FEATURES = SamplerFeatures(
    penalties=True, min_tokens=True, all_greedy=True,
)
PREFILL_SAMPLER_FEATURES = SamplerFeatures(
    penalties=True, top_k=True, top_p=True, min_p=True, typical_p=True,
    min_tokens=True, all_greedy=False,
)

logger = logging.getLogger("vllm_i64_tpu.runner")


from dataclasses import dataclass

# Step programs compile with the scoped-VMEM limit raised from the 16 MB
# default: XLA-TPU stack-allocates a pallas call's q input and output in
# scoped VMEM when the call sits inside the layer scan, which is exactly
# what the flash-prefill kernel needs at serving shapes (B=16 T=512: 32 MB
# staging). 98 MB leaves 30 MB of the v5e's 128 MB VMEM for kernel scratch
# and XLA's own fusions; A/B'd neutral on the decode/main bench config.
SCOPED_VMEM_LIMIT_KIB = 100352
# staging the gate in ops/attention.py may admit against that limit
PREFILL_STAGING_BUDGET = 64 * 1024 * 1024


def _prefill_compiler_options():
    """TPU-only compile options for PREFILL step programs.

    Only prefill programs get the raised scoped-VMEM limit: a same-epoch
    A/B on v5e (2026-08-20) showed the raise costs the decode-dominated
    main bench config ~20% (5134 -> 4092 tok/s) — XLA's fusion/prefetch
    heuristics degrade with the larger budget — while prefill needs it for
    the flash kernel's q/out staging. The CPU backend rejects unknown
    options, so it gets none."""
    import os

    try:
        if jax.default_backend() == "cpu":
            return None
    except Exception:  # pragma: no cover
        return None
    kib = int(os.environ.get(
        "VLLM_I64_TPU_SCOPED_VMEM_KIB", SCOPED_VMEM_LIMIT_KIB))
    if kib <= 0:
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}


# Debug: log each UNIQUE dispatched program combo (kind, buckets, statics)
# so warmup coverage can be diffed against real traffic (VERDICT r3 #4).
import os as _os

_LOG_DISPATCH = bool(_os.environ.get("VLLM_LOG_DISPATCH"))


# Serializes "set the process-global W8A8 flag -> trace/dispatch" so two
# engines with different w8a8 settings stepped from different threads can
# never interleave a flag flip between another runner's flag-set and its
# first trace of a new bucket shape (the jit cache is keyed on shapes, not
# the flag — a wrong-flag trace would bake the wrong numerics in forever).
# Held only across host-side enqueue; device execution is async.
_W8A8_DISPATCH_LOCK = threading.Lock()


@dataclass
class PendingWindow:
    """A dispatched-but-unresolved multistep decode window.

    `emitted` and `carry` are DEVICE arrays; `carry` is the scan loop state
    (tokens, positions, ctx_lens, active, left, gen_idx) that the next
    window resumes from without a host round-trip."""

    emitted: jax.Array  # (num_steps, b)
    carry: tuple
    b_actual: int
    b: int
    slot_ids: np.ndarray
    sample_args: Dict[str, np.ndarray]
    features: SamplerFeatures
    num_steps: int


def _bucket(value: int, buckets) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def _auto_kv_blocks(device, per_block_bytes: int, ecfg: EngineConfig,
                    fallback: int) -> int:
    """HBM-measured KV pool size (vLLM's gpu_memory_utilization analog).

    With max_kv_blocks=0, fill free device memory (after weights are
    resident) up to ``hbm_utilization``, leaving headroom for activations,
    logits buffers, and compiled-program scratch. Backends without memory
    stats (CPU, some plugins) keep the static heuristic."""
    try:
        if getattr(device, "platform", "cpu") == "cpu":
            # host "memory_stats" would report RAM, not accelerator HBM —
            # a pool sized to host memory explodes CPU test configs
            return fallback
        stats = device.memory_stats()
        limit = int(stats["bytes_limit"])
        in_use = int(stats.get("bytes_in_use", 0))
    except Exception:
        return fallback
    # headroom: logits (+ sampler) buffers scale with B x vocab; programs
    # and window side buffers take a few hundred MB on the flagship shapes
    headroom = 512 * 1024 * 1024
    budget = int(limit * ecfg.hbm_utilization) - in_use - headroom
    if budget <= per_block_bytes:
        return fallback
    blocks = budget // per_block_bytes
    if blocks < fallback:
        logger.warning(
            "HBM budget (%d MB free) sizes the KV pool to %d blocks, "
            "below the workload heuristic of %d — memory pressure likely",
            budget >> 20, blocks, fallback)
    return max(int(blocks), 16)


class ModelRunner:
    """Device-state owner + bucketed step program dispatcher."""

    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        engine_cfg: EngineConfig,
        mesh=None,
        kv_shardings=None,
    ):
        self.params = params
        self.cfg = model_cfg
        self.ecfg = engine_cfg
        self.mesh = mesh
        if mesh is not None:
            # The experimental per-seq Pallas decode/prefill kernels remain
            # single-device-only (they lose to the XLA gather at every
            # context the models serve — ops/attention.py:26-56 — so they
            # are off everywhere anyway). The PRODUCTION Pallas paths — the
            # flash-window decode kernel and fused norm+quant — now run
            # under the mesh via shard_map over the "tp" axis (the window
            # gate checks the per-device head geometry itself).
            from ..ops import attention as _attn

            _attn._PALLAS_DECODE = False
            _attn._PALLAS_PREFILL = False

        # W8A8 is a module-level flag captured when a program traces; setting
        # it before every dispatch (see _sync_w8a8) keeps multiple engines
        # with different settings consistent in one process.
        self._w8a8 = bool(engine_cfg.w8a8)
        # fused norm+quant: under a mesh the kernel runs replicated inside
        # shard_map (activations are replicated between layers under tp —
        # see models/complexity_deep._norm_maybe_quant)
        self._fused_norm_quant = bool(
            engine_cfg.fused_norm_quant and engine_cfg.w8a8)

        dtype = jnp.dtype(engine_cfg.kv_cache_dtype)
        num_blocks = engine_cfg.resolve_kv_blocks()
        if not engine_cfg.max_kv_blocks:  # auto: measure free HBM
            per_block = (
                2 * model_cfg.num_hidden_layers * engine_cfg.kv_block_size
                * model_cfg.num_key_value_heads * model_cfg.head_dim
                * jnp.dtype(dtype).itemsize
            )
            dev = (mesh.devices.flat[0] if mesh is not None
                   else jax.devices()[0])
            # under a tp mesh each device holds 1/tp of every block, so the
            # per-device budget supports tp x more blocks — keeping the
            # unscaled count is deliberately conservative
            num_blocks = _auto_kv_blocks(
                dev, per_block, engine_cfg, num_blocks)
        self.num_blocks = num_blocks
        # FLAT page shape: (L, NB, bs, Hkv*d). The trailing (bs, Hkv*d)
        # dims tile the TPU (8, 128) registers exactly, so one row-major
        # layout serves the write scatter, the decode gather, the window
        # merge and the Pallas kernels alike — the 5D (.., Hkv=4, d=64)
        # shape could not tile and cost whole-cache relayout copies
        # (r5 decode trace). External interop (export/import/swap wire
        # format) stays (L, n, bs, Hkv, d); boundaries reshape.
        kv_shape = (
            model_cfg.num_hidden_layers,
            num_blocks,
            engine_cfg.kv_block_size,
            model_cfg.num_key_value_heads * model_cfg.head_dim,
        )
        if mesh is not None:
            # place device state on THIS runner's mesh explicitly — two
            # runners on disjoint device groups (disaggregated serving)
            # must not both land on the process-default device
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import kv_cache_spec

            kv_sh = NamedSharding(mesh, kv_cache_spec())
            self.kv_k = jax.device_put(jnp.zeros(kv_shape, dtype), kv_sh)
            self.kv_v = jax.device_put(jnp.zeros(kv_shape, dtype), kv_sh)
            self.counts = jax.device_put(
                jnp.zeros(
                    (engine_cfg.max_batch_size, model_cfg.vocab_size),
                    jnp.int32,
                ),
                NamedSharding(mesh, P()),
            )
        else:
            # COMMIT the persistent buffers to their device at creation:
            # an uncommitted jnp.zeros keys the jit cache as
            # UnspecifiedValue, while the same buffer AFTER one program
            # round-trip keys as SingleDeviceSharding — so the first
            # program combo of a session compiled twice (once per key)
            # through the slow remote-compile tunnel (r5 longctx: an 8 s
            # recompile in the first post-warmup step).
            sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            self.kv_k = jax.device_put(jnp.zeros(kv_shape, dtype), sh)
            self.kv_v = jax.device_put(jnp.zeros(kv_shape, dtype), sh)
            self.counts = jax.device_put(
                jnp.zeros(
                    (engine_cfg.max_batch_size, model_cfg.vocab_size),
                    jnp.int32,
                ),
                sh,
            )
        # FIXED base key: the sampler's per-row keys are
        # fold_in(fold_in(base, seed), gen_index). Explicit request seeds
        # must reproduce across dispatches/batches, so the base never
        # rotates; unseeded rows get fresh host-drawn seeds per dispatch
        # (core/sampling.make_param_arrays).
        self._base_key = jax.random.PRNGKey(0)

        # raised scoped-VMEM limit admits the flash-prefill kernel's q/out
        # staging inside the layer scan (see SCOPED_VMEM_LIMIT_KIB); the
        # CPU backend ignores the TPU-only option
        from ..ops import attention as _attn2

        _attn2.set_prefill_staging_budget(PREFILL_STAGING_BUDGET)
        self.block_buckets = self._make_block_buckets()
        self._seen_combos = set()
        # slot -> pending counts row (np vector) or None (= clear); applied
        # as one batched scatter at the next dispatch (_flush_slot_counts)
        self._pending_slot_counts: Dict[int, Optional[np.ndarray]] = {}
        # Pin the persistent KV caches to the default row-major layout at
        # every program boundary. Left to layout auto-assignment, the write
        # programs prefer a token-minor cache layout while the window
        # decode's flat gather prefers row-major — XLA then reconciles with
        # a whole-cache (2 x 500 MB) relayout copy per decode window
        # (measured 5 ms/window in the r5 trace). One pinned layout
        # everywhere means no boundary copies and matching donation.
        # Pin layouts of the persistent DONATED buffers (kv caches, counts)
        # at every program boundary. Left to auto layout assignment, a
        # program's chosen output layout feeds the next call's input — and
        # a layout change recompiles the jit (each step program compiled
        # TWICE through the slow remote tunnel before this: once against
        # the creation layout, once against its own output layout).
        self._kv_fmt = self._counts_fmt = None
        if jax.default_backend() != "cpu":
            from jax.experimental import layout as jax_layout

            self._kv_fmt = jax_layout.Format(
                jax_layout.Layout(
                    major_to_minor=tuple(range(self.kv_k.ndim))),
                self.kv_k.sharding,
            )
            self._counts_fmt = jax_layout.Format(
                jax_layout.Layout(major_to_minor=(0, 1)),
                self.counts.sharding,
            )

        def _kv_out(*slots):
            """out_shardings pytree: 'kv'/'counts' pin those buffers,
            None = compiler's choice."""
            if self._kv_fmt is None:
                return {}
            fmts = {"kv": self._kv_fmt, "counts": self._counts_fmt}
            return {"out_shardings": tuple(fmts.get(s) for s in slots)}

        self._step_fn = functools.partial(
            jax.jit,
            static_argnames=("features", "return_logits",
                             "block_aligned_write"),
            donate_argnames=("kv_k", "kv_v", "counts"),
            # (tokens, out_logits, kv_k, kv_v, counts)
            **_kv_out(None, None, "kv", "kv", "counts"),
        )(self._step_impl)
        # prefill dispatches compile under the raised scoped-VMEM limit so
        # the flash-prefill kernel's q/out staging fits inside the layer
        # scan; decode programs keep the default (see
        # _prefill_compiler_options for the A/B)
        self._prefill_step_fn = functools.partial(
            jax.jit,
            static_argnames=("features", "return_logits",
                             "block_aligned_write"),
            donate_argnames=("kv_k", "kv_v", "counts"),
            **_kv_out(None, None, "kv", "kv", "counts"),
            compiler_options=_prefill_compiler_options(),
        )(self._step_impl)
        self._multi_decode_fn = functools.partial(
            jax.jit,
            static_argnames=("features", "num_steps"),
            donate_argnames=("kv_k", "kv_v", "counts"),
            # (emitted, carry_out, kv_k, kv_v, counts)
            **_kv_out(None, None, "kv", "kv", "counts"),
        )(self._multi_decode_impl)
        self._kv_out = _kv_out

    def _sync_w8a8(self):
        """Context manager: hold the dispatch lock with this runner's W8A8
        flag set (see _W8A8_DISPATCH_LOCK)."""
        import contextlib

        from ..ops.dequant_matmul import set_fused_norm_quant, set_w8a8
        from ..ops.ep_dispatch import set_ep_mesh

        @contextlib.contextmanager
        def scope():
            with _W8A8_DISPATCH_LOCK:
                set_w8a8(self._w8a8)
                set_fused_norm_quant(self._fused_norm_quant)
                # per-dispatch, like the W8A8 flag: two runners on
                # DIFFERENT meshes (disaggregated prefill/decode groups)
                # must each trace ep_a2a shard_maps against their OWN mesh
                set_ep_mesh(self.mesh)
                yield

        return scope()

    def _make_block_buckets(self):
        """Block-table width buckets, starting at 2: the decode gather reads
        the full STATIC bucket width per row, so an 8-block minimum made
        short-context decode read 4x over-width slabs (ablation on v5e,
        B=64 ctx 128 bs 128: history attention 2.3 ms/iter of an 8.3 ms
        step — most of it bucket padding). x4 steps keep the program-variant
        count unchanged."""
        mx = self.ecfg.max_blocks_per_seq
        buckets = []
        b = 2
        while b < mx:
            buckets.append(b)
            b *= 4
        buckets.append(mx)
        return tuple(buckets)

    # -- device program ------------------------------------------------------

    def _step_impl(
        self,
        params,
        kv_k,
        kv_v,
        counts,
        token_ids,  # (B, T) i32
        positions,  # (B, T) i32
        block_tables,  # (B, MB) i32
        ctx_lens,  # (B,) i32
        last_idx,  # (B,) i32
        valid,  # (B, T) bool
        slot_ids,  # (B,) i32
        sample_mask,  # (B,) bool — rows that produce a token this step
        key,
        sample_args: Dict[str, jax.Array],
        features: SamplerFeatures,
        return_logits: bool,
        soft_embeds=None,  # (B, T, H) VLM soft tokens (prefill only)
        soft_mask=None,  # (B, T) bool
        block_aligned_write: bool = False,
    ):
        logits, (kv_k, kv_v) = cdm.forward_step(
            params, self.cfg, token_ids, positions, (kv_k, kv_v),
            block_tables, ctx_lens, last_idx, valid,
            soft_embeds=soft_embeds, soft_mask=soft_mask,
            block_aligned_write=block_aligned_write,
        )
        row_counts = jnp.take(counts, slot_ids, axis=0) if features.penalties else None
        tokens = sample_tokens(
            logits,
            features=features,
            key=key,
            counts=row_counts,
            **sample_args,
        )
        # update history counts only for sampling rows
        upd_slots = jnp.where(sample_mask, slot_ids, jnp.int32(2**30))
        counts = counts.at[upd_slots, tokens].add(1, mode="drop")
        out_logits = logits if return_logits else None
        return tokens, out_logits, kv_k, kv_v, counts

    def _multi_decode_impl(
        self,
        params,
        kv_k,
        kv_v,
        counts,
        carry_in,  # (tokens, positions, ctx_lens, active, left, gen_idx) — (B,) each
        block_tables,  # (B, MB) i32 — capacity for +num_steps ensured by host
        slot_ids,  # (B,) i32
        key,
        sample_args: Dict[str, jax.Array],
        features: SamplerFeatures,
        num_steps: int,
    ):
        """num_steps decode iterations in ONE device dispatch.

        The sampled token feeds the next forward inside a lax.scan; rows
        freeze (no KV write, no count update) once they emit EOS or exhaust
        their token budget. This amortizes host<->device dispatch latency
        over num_steps tokens — the TPU analog of CUDA-graph decode replay,
        but covering the whole sample->embed loop, which a CUDA graph cannot.

        The loop state enters and leaves as an explicit carry of (B,) device
        arrays, so consecutive windows CHAIN without a host round-trip: the
        engine dispatches window N+1 from window N's carry before reading
        window N's tokens back, hiding dispatch latency entirely.
        """
        eos_ids = sample_args["eos_ids"]
        min_tokens = sample_args["min_tokens"]

        deferred = (
            self.ecfg.deferred_kv_decode and self.cfg.sliding_window is None
        )
        if deferred:
            # window KV side buffers: the cache stays read-only across the
            # scan; one merge_window_kv pair of scatters lands the whole
            # window (all layers x rows x steps) afterwards
            b = carry_in[0].shape[0]
            # carry ctx_lens COUNTS the current (not-yet-written) token;
            # the cache holds ctx_lens - 1 rows at window entry
            ctx_entry = carry_in[2]
            ctx0 = ctx_entry - 1
            win_shape = (
                self.cfg.num_hidden_layers, b, num_steps,
                self.cfg.num_key_value_heads * self.cfg.head_dim,
            )
            win_k = jnp.zeros(win_shape, kv_k.dtype)
            win_v = jnp.zeros(win_shape, kv_v.dtype)
        cache_k, cache_v = kv_k, kv_v  # read-only view for the deferred scan

        def body(carry, inp):
            k_idx, step_key = inp
            if deferred:
                (tokens, positions, ctx_lens, active, left, gen_idx,
                 win_k, win_v, counts) = carry
                logits, win_k, win_v = cdm.forward_step_window(
                    params, self.cfg, tokens[:, None], positions[:, None],
                    (cache_k, cache_v), block_tables, ctx0, win_k, win_v,
                    k_idx,
                )
            else:
                (tokens, positions, ctx_lens, active, left, gen_idx,
                 kv_k, kv_v, counts) = carry
                valid = active[:, None]
                logits, (kv_k, kv_v) = cdm.forward_step(
                    params, self.cfg, tokens[:, None], positions[:, None],
                    (kv_k, kv_v), block_tables, ctx_lens,
                    jnp.zeros_like(positions), valid,
                )
            row_counts = (
                jnp.take(counts, slot_ids, axis=0) if features.penalties else None
            )
            args = dict(sample_args)
            args["gen_index"] = gen_idx
            args["eos_suppress"] = gen_idx < min_tokens
            new_tokens = sample_tokens(
                logits, features=features, key=step_key, counts=row_counts, **args
            )
            upd_slots = jnp.where(active, slot_ids, jnp.int32(2**30))
            counts = counts.at[upd_slots, new_tokens].add(1, mode="drop")

            left = left - jnp.where(active, 1, 0)
            hit_eos = active & (new_tokens == eos_ids)
            next_active = active & ~hit_eos & (left > 0)
            emitted = jnp.where(active, new_tokens, -1)

            next_tokens = jnp.where(active, new_tokens, tokens)
            next_positions = positions + jnp.where(active, 1, 0)
            next_ctx = ctx_lens + jnp.where(active, 1, 0)
            gen_idx = gen_idx + jnp.where(active, 1, 0)
            state = (win_k, win_v) if deferred else (kv_k, kv_v)
            return (
                next_tokens, next_positions, next_ctx, next_active, left,
                gen_idx, *state, counts,
            ), emitted

        # the SAME base key every iteration: per-token variation comes from
        # gen_index inside the per-row fold, so a seeded request samples the
        # identical stream regardless of how dispatch windows are aligned
        # (and identically to the single-step path)
        step_keys = jnp.broadcast_to(key, (num_steps, *key.shape))
        if deferred:
            carry0 = (*carry_in, win_k, win_v, counts)
            carry, emitted = jax.lax.scan(
                body, carry0,
                (jnp.arange(num_steps, dtype=jnp.int32), step_keys))
            (*carry_out, win_k, win_v, counts) = carry
            # land the whole window (all layers x rows x steps) in one pair
            # of scatters; frozen/padding rows drop via out-of-range slots
            # active iterations this window == ctx growth (one per active
            # step); iteration j wrote its token at position ctx0 + j
            steps_taken = carry_out[2] - ctx_entry
            from ..ops.attention import merge_window_kv

            kv_k, kv_v = merge_window_kv(
                kv_k, kv_v, win_k, win_v, block_tables, ctx0, steps_taken)
            return emitted, tuple(carry_out), kv_k, kv_v, counts
        carry0 = (*carry_in, kv_k, kv_v, counts)
        carry, emitted = jax.lax.scan(
            body, carry0,
            (jnp.arange(num_steps, dtype=jnp.int32), step_keys))
        (*carry_out, kv_k, kv_v, counts) = carry
        return emitted, tuple(carry_out), kv_k, kv_v, counts

    def dispatch_multi_decode(
        self,
        last_tokens: np.ndarray,  # (B,) i64
        positions: np.ndarray,  # (B,) i32
        block_tables: np.ndarray,  # (B, MB_actual) i32
        ctx_lens: np.ndarray,  # (B,) i32
        slot_ids: np.ndarray,  # (B,) i32
        tokens_left: np.ndarray,  # (B,) i32
        sample_args: Dict[str, np.ndarray],
        features: SamplerFeatures,
        num_steps: int,
    ) -> "PendingWindow":
        """Enqueue one multistep window; returns a handle WITHOUT any host
        readback. Resolve with `resolve_window`; chain the next window from
        the handle's on-device carry with `resume_multi_decode`."""
        b_actual = last_tokens.shape[0]
        b = _bucket(b_actual, self.ecfg.decode_batch_buckets)
        mb = self._window_mb(block_tables, ctx_lens, num_steps)

        def pad1(a, fill=0):
            out = np.full((b,), fill, dtype=a.dtype)
            out[:b_actual] = a
            return out

        bt = np.zeros((b, mb), np.int32)
        bt[:b_actual, : min(block_tables.shape[1], mb)] = block_tables[:, :mb]

        active = np.zeros(b, bool)
        active[:b_actual] = True

        padded_args = {k: pad1(v) for k, v in sample_args.items()}
        carry_in = (
            pad1(last_tokens.astype(np.int32)),
            pad1(positions.astype(np.int32)),
            pad1(ctx_lens.astype(np.int32)),
            active,
            pad1(np.maximum(tokens_left, 1).astype(np.int32)),
            padded_args["gen_index"],
        )
        slots = pad1(slot_ids.astype(np.int32))
        if _LOG_DISPATCH:
            combo = ("win", b, mb, num_steps, features)
            if combo not in self._seen_combos:
                self._seen_combos.add(combo)
                logging.getLogger(__name__).warning(
                    "DISPATCH-COMBO win %s", combo)
        with self._sync_w8a8():
            (emitted, carry, self.kv_k, self.kv_v,
             self.counts) = self._multi_decode_fn(
                self.params, self.kv_k, self.kv_v, self.counts,
                carry_in, bt, slots, self._base_key,
                padded_args, features, num_steps,
            )
        return PendingWindow(
            emitted=emitted, carry=carry, b_actual=b_actual, b=b,
            slot_ids=slots, sample_args=padded_args, features=features,
            num_steps=num_steps,
        )

    def resume_multi_decode(
        self,
        prev: "PendingWindow",
        block_tables: np.ndarray,  # (b_actual, MB_actual) — may have grown
        ctx_lens_host: np.ndarray,  # (b_actual,) host VIEW (lags device by ≤k)
    ) -> "PendingWindow":
        """Dispatch the next window directly from a previous window's
        on-device carry — no host readback in between. The host's stale
        ctx view only sizes the block-table bucket (with +2k headroom)."""
        k = prev.num_steps
        mb = self._window_mb(block_tables, ctx_lens_host, 2 * k)
        if _LOG_DISPATCH:
            combo = ("resume", prev.b, mb, k, prev.features)
            if combo not in self._seen_combos:
                self._seen_combos.add(combo)
                logging.getLogger(__name__).warning(
                    "DISPATCH-COMBO resume %s", combo)
        bt = np.zeros((prev.b, mb), np.int32)
        bt[: prev.b_actual, : min(block_tables.shape[1], mb)] = (
            block_tables[:, :mb]
        )
        self._flush_slot_counts()
        with self._sync_w8a8():
            (emitted, carry, self.kv_k, self.kv_v,
             self.counts) = self._multi_decode_fn(
                self.params, self.kv_k, self.kv_v, self.counts,
                prev.carry, bt, prev.slot_ids, self._base_key,
                prev.sample_args, prev.features, k,
            )
        return PendingWindow(
            emitted=emitted, carry=carry, b_actual=prev.b_actual, b=prev.b,
            slot_ids=prev.slot_ids, sample_args=prev.sample_args,
            features=prev.features, num_steps=k,
        )

    def resolve_window(self, win: "PendingWindow") -> np.ndarray:
        """Host-sync one window's emitted tokens: (num_steps, b_actual)."""
        return np.asarray(win.emitted)[:, : win.b_actual]

    def _window_mb(self, block_tables, ctx_lens, extra_tokens: int) -> int:
        bs = self.ecfg.kv_block_size
        mb_needed = max(
            int(block_tables.shape[1]),
            -(-(int(np.max(ctx_lens)) + extra_tokens) // bs),
            1,
        )
        return _bucket(mb_needed, self.block_buckets)

    def execute_multi_decode(
        self,
        last_tokens: np.ndarray,  # (B,) i64
        positions: np.ndarray,  # (B,) i32
        block_tables: np.ndarray,  # (B, MB_actual) i32
        ctx_lens: np.ndarray,  # (B,) i32
        slot_ids: np.ndarray,  # (B,) i32
        tokens_left: np.ndarray,  # (B,) i32
        sample_args: Dict[str, np.ndarray],
        features: SamplerFeatures,
        num_steps: int,
    ) -> np.ndarray:
        """Returns (num_steps, B) emitted tokens (-1 where row was frozen)."""
        win = self.dispatch_multi_decode(
            last_tokens, positions, block_tables, ctx_lens, slot_ids,
            tokens_left, sample_args, features, num_steps,
        )
        return self.resolve_window(win)

    # -- host-facing step ------------------------------------------------------

    def execute(
        self,
        token_ids: np.ndarray,  # (B, T) i64/i32 padded
        positions: np.ndarray,  # (B, T) i32
        block_tables: np.ndarray,  # (B, MB_actual) i32
        ctx_lens: np.ndarray,  # (B,) i32
        last_idx: np.ndarray,  # (B,) i32
        valid: np.ndarray,  # (B, T) bool
        slot_ids: np.ndarray,  # (B,) i32
        sample_mask: np.ndarray,  # (B,) bool
        sample_args: Dict[str, np.ndarray],
        features: SamplerFeatures,
        return_logits: bool = False,
        kind: str = "decode",
        defer: bool = False,
        soft_embeds: Optional[np.ndarray] = None,  # (B, T, H) f32
        soft_mask: Optional[np.ndarray] = None,  # (B, T) bool
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Pad to buckets, run the step program, return (tokens, logits?).

        defer=True skips the host readback and returns device arrays —
        callers that dispatch several groups in one step (prefill parts)
        pipeline them instead of paying a round-trip per group."""
        b_actual, t_actual = token_ids.shape
        if kind == "decode":
            b = _bucket(b_actual, self.ecfg.decode_batch_buckets)
            t = 1
        else:
            b = _bucket(b_actual, self.ecfg.prefill_batch_buckets)
            t = _bucket(t_actual, self.ecfg.prefill_token_buckets)
            # canonicalize onto one of TWO prefill sampler families —
            # bit-exact for every row: greedy rows take the final where()'s
            # argmax, penalties/filters no-op exactly at neutral values
            # (core/sampling.for_params documents the guards)
            features = (PREFILL_GREEDY_FEATURES if features.all_greedy
                        else PREFILL_SAMPLER_FEATURES)

        if kind == "prefill" and np.any(valid):
            # clamp the block table to this dispatch's actual position span:
            # the engine passes each row's FULL allocated table (sized for
            # the whole prompt), but an early chunk of a long prompt only
            # reads/writes blocks up to its own positions — the gather's
            # cost scales with the STATIC table bucket, so a 512-token first
            # chunk of a 1920-token prompt was paying a 2048-token-span
            # gather per layer (longctx TTFT was ~4x the compute bound)
            span = int(positions[valid].max()) + 1
            mb_needed = max(-(-span // self.ecfg.kv_block_size), 1)
        else:
            mb_needed = max(int(block_tables.shape[1]), 1)
        mb = _bucket(mb_needed, self.block_buckets)

        def pad2(a, fill=0, dtype=None):
            out = np.full((b, t), fill, dtype=dtype or a.dtype)
            out[:b_actual, :t_actual] = a
            return out

        def pad1(a, fill=0, dtype=None):
            out = np.full((b,), fill, dtype=dtype or a.dtype)
            out[:b_actual] = a
            return out

        bt = np.zeros((b, mb), np.int32)
        w = min(block_tables.shape[1], mb)
        bt[:b_actual, :w] = block_tables[:, :w]

        padded_args = {
            k: pad1(v) if v.ndim == 1 else v for k, v in sample_args.items()
        }
        soft_e = soft_m = None
        if soft_embeds is not None:
            # None vs array changes the treedef -> the VLM step is its own
            # compiled program; non-VLM dispatches never pay for these pads
            soft_e = np.zeros((b, t, soft_embeds.shape[-1]), np.float32)
            soft_e[:b_actual, :t_actual] = soft_embeds
            soft_m = pad2(soft_mask, fill=False)
        # block-aligned prefill write: every ACTUAL row starts on a block
        # boundary and covers whole blocks (chunk budgets are block
        # multiples in production, so this is the common case). The flag is
        # a jit-static arg — aligned and unaligned dispatches compile
        # separate programs.
        bsz = self.ecfg.kv_block_size
        aligned = bool(
            kind == "prefill"
            and t % bsz == 0
            and t >= bsz
            and np.all(positions[:, 0] % bsz == 0)
            and np.all(valid.sum(axis=1) % bsz == 0)
            # write_kv's block_aligned contract additionally requires each
            # row's valid tokens to be a CONTIGUOUS PREFIX with CONTIGUOUS
            # positions (whole-block images); cheap host check so a future
            # caller violating it falls back instead of corrupting the cache
            # (padding beyond the valid prefix is exempt — write_kv only
            # covers whole blocks inside the prefix)
            and np.all((np.diff(positions, axis=1) == 1) | ~valid[:, 1:])
            and np.all(
                valid
                == (np.arange(t_actual)[None] < valid.sum(axis=1)[:, None])
            )
        )
        # padding rows must not look greedy-sampled into counts
        self._flush_slot_counts()
        step_fn = self._prefill_step_fn if kind == "prefill" else self._step_fn
        if _LOG_DISPATCH:
            combo = (kind, b, t, mb, aligned, bool(return_logits),
                     soft_embeds is not None, features)
            if combo not in self._seen_combos:
                self._seen_combos.add(combo)
                logging.getLogger(__name__).warning(
                    "DISPATCH-COMBO exec %s", combo)
        with self._sync_w8a8():
            tokens, logits, self.kv_k, self.kv_v, self.counts = step_fn(
            self.params,
            self.kv_k,
            self.kv_v,
            self.counts,
            pad2(token_ids.astype(np.int32)),
            pad2(positions.astype(np.int32)),
            bt,
            pad1(ctx_lens.astype(np.int32)),
            pad1(last_idx.astype(np.int32)),
            pad2(valid, fill=False),
            pad1(slot_ids.astype(np.int32)),
            pad1(sample_mask, fill=False),
            self._base_key,
            padded_args,
            features,
            return_logits,
            soft_e,
            soft_m,
            aligned,
        )
        if defer:
            return tokens, logits  # device arrays; slice after conversion
        tokens_np = np.asarray(tokens)[:b_actual]
        logits_np = np.asarray(logits)[:b_actual] if logits is not None else None
        return tokens_np, logits_np

    def _verify_impl(self, params, kv_k, kv_v, token_ids, positions,
                     block_tables, ctx_lens, valid):
        """Speculative verify: paged forward writing candidate K/V, returning
        fp32 logits at EVERY position (B, T, V)."""
        hidden, (kv_k, kv_v) = cdm.forward_hidden(
            params, self.cfg, token_ids, positions,
            kv=(kv_k, kv_v), block_tables=block_tables, ctx_lens=ctx_lens,
            valid=valid,
        )
        logits = cdm.lm_logits(params, self.cfg, hidden)
        return logits, kv_k, kv_v

    def execute_verify(
        self,
        token_ids: np.ndarray,  # (1, T)
        positions: np.ndarray,  # (1, T)
        block_tables: np.ndarray,  # (1, MB)
        ctx_lens: np.ndarray,  # (1,)
        valid: np.ndarray,  # (1, T)
    ) -> np.ndarray:
        """Run the verify program for one sequence; returns (T, V) logits."""
        if not hasattr(self, "_verify_fn"):
            self._verify_fn = jax.jit(
                self._verify_impl, donate_argnames=("kv_k", "kv_v"),
                **self._kv_out(None, "kv", "kv"),
                compiler_options=_prefill_compiler_options())
        t_actual = token_ids.shape[1]
        mb = _bucket(max(int(block_tables.shape[1]), 1), self.block_buckets)
        bt = np.zeros((1, mb), np.int32)
        bt[:, : block_tables.shape[1]] = block_tables
        with self._sync_w8a8():
            logits, self.kv_k, self.kv_v = self._verify_fn(
            self.params, self.kv_k, self.kv_v,
            token_ids.astype(np.int32), positions.astype(np.int32), bt,
            ctx_lens.astype(np.int32), valid,
        )
        return np.asarray(logits[0], np.float32)[:t_actual]


    # -- slot/count management -------------------------------------------------

    def load_slot_history(self, slot: int, token_ids: np.ndarray) -> None:
        """Record prompt token counts for penalty tracking at admission.

        LAZY: the device update is deferred and batched into one scatter at
        the next dispatch (_flush_slot_counts). Eagerly updating per slot
        cost ~2.2 ms of host-blocking dispatch per call through the remote
        tunnel — a 64-request burst admission paid ~140 ms of it before the
        prefill even dispatched (r5 profile)."""
        bc = np.bincount(
            np.clip(token_ids, 0, self.cfg.vocab_size - 1),
            minlength=self.cfg.vocab_size,
        ).astype(np.int32)
        self._pending_slot_counts[slot] = bc

    def clear_slot(self, slot: int) -> None:
        """Lazily zero a slot's penalty counts (see load_slot_history).

        Clears only matter when the slot is REASSIGNED, and every dispatch
        flushes pending updates first, so deferring is exact."""
        self._pending_slot_counts[slot] = None

    def _flush_slot_counts(self) -> None:
        """Apply all pending slot-count updates as ONE batched scatter.

        The batch is padded to a power-of-two row count (duplicating row 0,
        same value — scatter-set with identical duplicate updates is
        deterministic) so the eager op only ever compiles at
        log2(max_batch) distinct shapes. Pure clears skip the (n, vocab)
        value upload entirely via the scalar-fill form."""
        if not self._pending_slot_counts:
            return
        items = sorted(self._pending_slot_counts.items())
        self._pending_slot_counts.clear()
        n = len(items)
        nb = 1
        while nb < n:
            nb *= 2
        idx = np.fromiter((s for s, _ in items), np.int32, n)
        if nb > n:
            idx = np.concatenate([idx, np.full(nb - n, idx[0], np.int32)])
        if all(v is None for _, v in items):
            self.counts = self.counts.at[jnp.asarray(idx)].set(0)
        else:
            vals = np.zeros((nb, self.counts.shape[1]), np.int32)
            for i, (_, v) in enumerate(items):
                if v is not None:
                    vals[i] = v
            if nb > n and items[0][1] is not None:
                vals[n:] = items[0][1]
            self.counts = self.counts.at[jnp.asarray(idx)].set(
                jnp.asarray(vals))
        # re-commit to the pinned format: the eager scatter's output keys
        # the jit cache differently from the program-boundary layout, and
        # ONE admission after a release cycle recompiled the whole step
        # program (~9 s through the remote tunnel, r5 bench epoch 1)
        if self._counts_fmt is not None:
            self.counts = jax.device_put(self.counts, self._counts_fmt)

    def kv_cache_memory_bytes(self) -> int:
        return int(self.kv_k.size + self.kv_v.size) * self.kv_k.dtype.itemsize

    def convert_kv_dtype(self, dtype) -> None:
        """In-flight KV cache dtype conversion (fp8 auto-upgrade,
        ref: kv_cache.py:819-831). Existing entries are cast; compiled step
        programs re-specialize on the new dtype automatically."""
        dtype = jnp.dtype(dtype)
        if self.kv_k.dtype == dtype:
            return
        self.kv_k = self.kv_k.astype(dtype)
        self.kv_v = self.kv_v.astype(dtype)

    # -- exhaustive program warmup ------------------------------------------

    def _warmup_sample_args(self, b: int) -> Dict[str, np.ndarray]:
        """Neutral per-row sampler arrays — the compiled program specializes
        on SamplerFeatures (static), never on these VALUES."""
        return dict(
            temperature=np.zeros(b, np.float32),
            top_k=np.zeros(b, np.int32),
            top_p=np.ones(b, np.float32),
            min_p=np.zeros(b, np.float32),
            typical_p=np.ones(b, np.float32),
            rep_pen=np.ones(b, np.float32),
            freq_pen=np.zeros(b, np.float32),
            pres_pen=np.zeros(b, np.float32),
            seeds=np.zeros(b, np.int32),
            gen_index=np.zeros(b, np.int32),
            eos_suppress=np.zeros(b, bool),
            eos_ids=np.zeros(b, np.int32),
            min_tokens=np.zeros(b, np.int32),
            suppress_step0=np.full(b, -1, np.int32),
        )

    def warmup_programs(
        self,
        feature_sets,
        logits_feature_sets=(),
        include_prefill: bool = True,
        include_decode: bool = True,
        log=None,
    ) -> int:
        """Precompile every bucketed step program this config can dispatch.

        Step programs compile lazily, keyed on (kind, batch bucket, token
        bucket, block-table bucket, aligned-write flag, SamplerFeatures,
        window length, return_logits). Which combination a serving step
        hits depends on request ARRIVAL TIMING — nondeterministic under
        concurrent load — so a single runtime compile (seconds of remote
        compile on TPU) can land mid-traffic and stall every in-flight
        request. This enumerates the reachable program space and dispatches
        one bucket-exact dummy batch per program through the REAL
        execute/dispatch paths, so warmed programs are identical to serving
        programs by construction. (The reference has the same lazy-capture
        stall with CUDA graphs; its fix is likewise an exhaustive capture
        pass at startup, ref: i64_engine.py:200-231.)

        Dummy dispatches write KV only into the reserved null block 0
        (never owned by a request) and sampler-count rows are cleared per
        slot at request assignment — warmup leaves no observable state.

        NOT covered (compile on first use): VLM soft-embed programs (their
        own treedef) and speculative-verify programs (policy OFF on TPU).

        ``feature_sets``: SamplerFeatures to warm (each is its own program
        family). ``logits_feature_sets``: subset additionally warmed with
        return_logits=True (host-sampling / logprobs / stop-sequence rows).
        Returns the number of programs dispatched.
        """
        ecfg, bs = self.ecfg, self.ecfg.kv_block_size
        t0 = time.perf_counter()
        fsets = list(dict.fromkeys(feature_sets))
        lsets = list(dict.fromkeys(logits_feature_sets))
        n = 0

        def _log(msg):
            if log is not None:
                log(f"[warmup] {msg} ({time.perf_counter() - t0:.1f}s)")

        # slot count maintenance is a batched scatter compiled per
        # power-of-two batch size (plus a value-carrying variant) — touch
        # every flush shape so admission can't stall on a first-use compile
        nslots = int(self.counts.shape[0])
        nb = 1
        while True:
            for s in range(min(nb, nslots)):
                self.clear_slot(s)
            self._flush_slot_counts()
            self.load_slot_history(0, np.zeros(1, np.int64))
            for s in range(1, min(nb, nslots)):
                self.clear_slot(s)
            self._flush_slot_counts()
            if nb >= nslots:
                break
            nb *= 2
        # leave the counts table clean for admission
        for s in range(nslots):
            self.clear_slot(s)
        self._flush_slot_counts()

        if include_decode:
            window_ks = []
            k = ecfg.multistep_decode
            if k > 1:
                window_ks.append(k)
                mixed = min(k, ecfg.multistep_mixed or 0)
                if 1 < mixed < k:
                    window_ks.append(mixed)
            for fs in fsets:
                for b in ecfg.decode_batch_buckets:
                    sargs = self._warmup_sample_args(b)
                    for mb in self.block_buckets:
                        # windows (the production decode path): dispatch,
                        # then RESUME from the dispatched window's device-
                        # resident carry — the chained entry point is a
                        # distinct program-cache entry (committed inputs)
                        for wk in window_ks:
                            win = self.dispatch_multi_decode(
                                np.zeros(b, np.int64),
                                np.zeros(b, np.int32),
                                np.zeros((b, mb), np.int32),
                                np.ones(b, np.int32),
                                np.zeros(b, np.int32),
                                np.full(b, wk, np.int32),
                                dict(sargs), fs, num_steps=wk,
                            )
                            win2 = self.resume_multi_decode(
                                win,
                                np.zeros((b, mb), np.int32),
                                np.ones(b, np.int32),
                            )
                            self.resolve_window(win2)
                            n += 2
                            _log(f"decode window+resume b={b} mb={mb} "
                                 f"k={wk} #{n}")
                        # single-step decode (host-path rows, k=1 configs)
                        for rl, ls in ((False, fsets), (True, lsets)):
                            if fs not in ls:
                                continue
                            pos = np.full(b, max(mb * bs - 2, 0), np.int32)
                            self.execute(
                                np.zeros((b, 1), np.int64),
                                pos[:, None],
                                np.zeros((b, mb), np.int32),
                                pos + 1,
                                np.zeros(b, np.int32),
                                np.ones((b, 1), bool),
                                np.zeros(b, np.int32),
                                np.ones(b, bool),
                                dict(sargs), fs,
                                return_logits=rl, kind="decode",
                            )
                            n += 1
                            _log(f"decode single b={b} mb={mb} "
                                 f"logits={rl} #{n}")

        if include_prefill:
            # prefill dispatches are canonicalized onto TWO sampler
            # families (ModelRunner.execute) — the feature axis collapses
            # out of the prefill program space. The generic family is only
            # reachable when sampled traffic is possible.
            pre_sets = [PREFILL_GREEDY_FEATURES]
            if any(not f.all_greedy for f in fsets):
                pre_sets.append(PREFILL_SAMPLER_FEATURES)
            prefill_budget = max(ecfg.max_prefill_tokens,
                                 ecfg.prefill_token_buckets[0])
            for fs in pre_sets:
                for b in ecfg.prefill_batch_buckets:
                    sargs = self._warmup_sample_args(b)
                    for t in ecfg.prefill_token_buckets:
                        # the engine's _budget_split never emits a part
                        # whose bucketed area exceeds the chunk budget
                        # (except unsplittable single rows, b=1) — prune
                        # the unreachable combos from the program space
                        if b > 1 and b * t > prefill_budget:
                            continue
                        for mb in self.block_buckets:
                            # mb < ceil(t/bs) is REACHABLE: groups pad rows
                            # up to the token bucket, and the span clamp
                            # sizes mb from the rows' ACTUAL max position —
                            # e.g. 8 rows of 200 tokens grouped into the
                            # 512 bucket dispatch (b8, t512, mb2)
                            start = max(mb * bs - t, 0)
                            nfull = min(t, mb * bs)
                            pos = np.broadcast_to(
                                np.arange(start, start + t, dtype=np.int32),
                                (b, t)).copy()
                            aligned_states = [True, False] if (
                                t % bs == 0 and t >= bs) else [False]
                            for aligned in aligned_states:
                                valid = np.zeros((b, t), bool)
                                valid[:, :nfull] = True
                                if not aligned and nfull % bs == 0:
                                    valid[:, nfull - 1] = False
                                nv = int(valid[0].sum())
                                if nv < 1:
                                    continue
                                rls = [False] + ([True] if lsets else [])
                                for rl in rls:
                                    self.execute(
                                        np.zeros((b, t), np.int64),
                                        pos,
                                        np.zeros((b, mb), np.int32),
                                        np.full(b, start + nv, np.int32),
                                        np.full(b, nv - 1, np.int32),
                                        valid,
                                        np.zeros(b, np.int32),
                                        np.ones(b, bool),
                                        dict(sargs), fs,
                                        return_logits=rl, kind="prefill",
                                    )
                                    n += 1
                                    _log(f"prefill b={b} t={t} mb={mb} "
                                         f"aligned={aligned} logits={rl} "
                                         f"#{n}")
        return n

    # -- KV swap to host (ref: kv_cache.py enable_swap/swap_out/swap_in
    # :711-813 — pinned-memory mirror; here: host numpy arrays) -------------

    # -- device-to-device block export/import (disaggregated prefill/decode;
    # ref: KVTransfer's per-layer per-block dist.send/recv loop,
    # disaggregated.py:105-320 — here ONE gather / ONE scatter, and the
    # arrays move between device groups via jax.device_put with NO host
    # staging) ---------------------------------------------------------------

    def _block_id_bucket(self, n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return min(b, self.num_blocks)

    def export_blocks_device(self, block_ids) -> Tuple[jax.Array, jax.Array]:
        """Gather the given physical blocks (all layers) as device arrays
        (L, n, bs, Hkv, d). Padding slots gather the null block 0 so the
        compiled gather is bucketed on block count."""
        ids = np.zeros((self._block_id_bucket(len(block_ids)),), np.int32)
        ids[: len(block_ids)] = np.asarray(block_ids, np.int32)
        hkv = self.cfg.num_key_value_heads
        hdim = self.cfg.head_dim
        if not hasattr(self, "_export_fn"):
            # boundary reshape: the wire/interop format keeps per-head dims
            self._export_fn = jax.jit(
                lambda ck, cv, ids: (
                    ck[:, ids].reshape(*ck.shape[:1], ids.shape[0],
                                       ck.shape[2], hkv, hdim),
                    cv[:, ids].reshape(*cv.shape[:1], ids.shape[0],
                                       cv.shape[2], hkv, hdim),
                ))
        k, v = self._export_fn(self.kv_k, self.kv_v, jnp.asarray(ids))
        return k[:, : len(block_ids)], v[:, : len(block_ids)]

    def import_blocks_device(self, k: jax.Array, v: jax.Array,
                             target_block_ids) -> None:
        """Scatter transferred block contents (L, n, bs, Hkv, d) into this
        runner's paged cache. ``jax.device_put`` reshards the source arrays
        onto this runner's devices (ICI/DCN on hardware, no host copy);
        padding slots scatter into the null block 0 (reserved trash)."""
        n = k.shape[1]
        bucket = self._block_id_bucket(n)
        ids = np.zeros((bucket,), np.int32)
        ids[:n] = np.asarray(target_block_ids, np.int32)[:n]
        if bucket != n:
            pad = [(0, 0)] * k.ndim
            pad[1] = (0, bucket - n)
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        # wire format (L, n, bs, Hkv, d) -> flat pages (L, n, bs, HD)
        k = k.reshape(*k.shape[:3], -1)
        v = v.reshape(*v.shape[:3], -1)
        k = jax.device_put(k, self.kv_k.sharding)
        v = jax.device_put(v, self.kv_v.sharding)
        if not hasattr(self, "_import_fn"):
            self._import_fn = jax.jit(
                lambda ck, cv, k, v, ids: (
                    ck.at[:, ids].set(k.astype(ck.dtype)),
                    cv.at[:, ids].set(v.astype(cv.dtype)),
                ),
                donate_argnums=(0, 1),
                **self._kv_out("kv", "kv"),
            )
        self.kv_k, self.kv_v = self._import_fn(
            self.kv_k, self.kv_v, k, v, jnp.asarray(ids))

    def swap_out_blocks(self, block_ids) -> dict:
        """Copy the given physical blocks (all layers) to host memory.
        Returns {block_id: (k_np, v_np)} with arrays (L, bs, Hkv, d)."""
        ids = np.asarray(block_ids, np.int32)
        hkv, hdim = self.cfg.num_key_value_heads, self.cfg.head_dim
        k = np.asarray(self.kv_k[:, ids])  # (L, n, bs, HD)
        v = np.asarray(self.kv_v[:, ids])
        k = k.reshape(*k.shape[:3], hkv, hdim)
        v = v.reshape(*v.shape[:3], hkv, hdim)
        return {int(b): (k[:, i], v[:, i]) for i, b in enumerate(ids)}

    def swap_in_blocks(self, saved: dict, target_block_ids) -> None:
        """Write host-saved block contents into (possibly different)
        physical blocks, in the order given."""
        src = list(saved.values())
        ids = np.asarray(target_block_ids, np.int32)
        k = jnp.asarray(np.stack([s[0] for s in src], axis=1),
                        self.kv_k.dtype)  # (L, n, bs, Hkv, d)
        v = jnp.asarray(np.stack([s[1] for s in src], axis=1),
                        self.kv_v.dtype)
        k = k.reshape(*k.shape[:3], -1)  # -> flat pages (L, n, bs, HD)
        v = v.reshape(*v.shape[:3], -1)
        self.kv_k = self.kv_k.at[:, ids].set(k)
        self.kv_v = self.kv_v.at[:, ids].set(v)
