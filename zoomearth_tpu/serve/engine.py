"""Continuous-batching serving engine: slot-based KV cache, chunked decode, per-request
sampling. The vLLM-equivalent (SURVEY.md §2.4: paged-attention engine + scheduler) built
TPU-first: a fixed pool of B cache slots, one jitted decode program stepping ALL active
slots together, and batched pool-level prefill so requests join and leave mid-flight
without recompilation or draining the batch.

Design notes (v2):
- Admission and continuation share ONE device program: `_pool_prefill` chunk-prefills a
  padded (max_slots, S) batch of token chunks DIRECTLY into the slot pool at each row's
  keep_len (0 for fresh prompts, prompt+kept for stage-2 continuations), with
  non-participating rows masked out. A burst of N queued requests costs one batched
  prefill instead of N serial single-row prefills + N cache insert copies, and the first
  token of each row is sampled on device (no per-request logits readback).
- Prefix KV cache: `set_prefix(token_ids)` prefills the shared instruction prefix once
  (the ~400-token ZoomEarth PREFIX+INSTRUCTION every request repeats — the reference
  gets this from vLLM's enable_prefix_caching, vllm_grpo_trainer.py:415-417); admission
  then copies the cached KV into each new slot and prefills only the suffix.
- Rows not participating in a prefill write garbage KV at [length, length+S) — beyond
  their valid window, never read (attention masks slot >= length) and overwritten by
  their own subsequent decode steps, so no isolation copies are needed.

Host-side scheduler (pure Python — not on the hot path): drains the queue each tick,
groups admissions/continuations into batched prefills, pumps K decode steps, retires
finished slots. The device never waits on the host between the K steps.
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VLMConfig
from ..models.decoder import KVCache
from ..models.rope import mrope_chunk_position_ids, mrope_position_ids
from ..models.vit import vision_metadata
from ..models.vlm import compute_vision_embeds, vision_meta_to_device, vlm_forward
from ..runtime.generate import DEFAULT_LENGTH_BUCKETS, bucket

# Coarser than the batch Generator's buckets on purpose: admission batches vary in how
# many images they carry (scheduler timing), and every distinct bucket is a fresh ViT
# compile — pad more, compile less.
ENGINE_PATCH_BUCKETS = (0, 4096, 12800, 24576, 32768)


@dataclasses.dataclass
class Request:
    request_id: str
    token_ids: List[int]
    images: List[Tuple[np.ndarray, Tuple[int, int, int]]]  # (pixel_values, grid)
    max_tokens: int = 256
    temperature: float = 0.0
    top_p: float = 1.0
    # hold_slot: keep the KV cache resident after completion so a continuation
    # (stage-2 zoom) can resume from it — the episode-serving pattern.
    hold_slot: bool = False
    # Prefix caching (vLLM's enable_prefix_caching equivalent, incl. image blocks):
    # prefix_key names the shared leading span token_ids[:prefix_len] (which may
    # contain expanded image pads — e.g. "system + stage-1 image" shared by every
    # question about the same LRS-GRO tile). First request computes and stores its KV;
    # later requests with the same key prefill only the suffix and skip the prefix's
    # ViT pass entirely. n_prefix_images of `images` belong to the prefix span.
    prefix_key: Optional[str] = None
    prefix_len: int = 0
    n_prefix_images: int = 0
    enqueued_at: float = dataclasses.field(default_factory=time.time)


@dataclasses.dataclass
class Continuation:
    """Continue a HELD request: truncate its cache to prompt + kept_tokens generated
    tokens, prefill chunk_ids (e.g. residual text + crop vision tokens), decode on."""

    parent_request_id: str
    request_id: str
    chunk_ids: List[int]
    images: List[Tuple[np.ndarray, Tuple[int, int, int]]]
    kept_tokens: int  # generated tokens to keep from the parent
    max_tokens: int = 256
    temperature: float = 0.0
    hold_slot: bool = False


@dataclasses.dataclass
class Completion:
    request_id: str
    token_ids: List[int]
    finish_reason: str  # "stop" | "length"
    prompt_tokens: int
    created_at: float = dataclasses.field(default_factory=time.time)


@dataclasses.dataclass
class _Slot:
    request: Optional[Request] = None
    generated: List[int] = dataclasses.field(default_factory=list)
    remaining: int = 0
    held: bool = False  # completed but cache retained for a continuation
    prompt_len: int = 0
    prompt_next_pos: int = 0  # M-RoPE position right after the prompt


@dataclasses.dataclass
class _PrefillRow:
    """One host-prepared row of a batched pool prefill."""

    slot: int
    request: Request
    chunk_ids: List[int]
    images: List[Tuple[np.ndarray, Tuple[int, int, int]]]
    keep_len: int  # cache entries kept below the chunk
    start_pos: int  # M-RoPE position of the chunk's first token
    prompt_len: int  # full logical prompt length after this prefill
    use_prefix: Optional[str] = None  # prefix-store key whose KV seeds this slot
    save_prefix: Optional[str] = None  # store [0, prefix_len) KV under this key after
    prefix_next_pos: int = 0  # M-RoPE position after the prefix span (save path)
    done: bool = False  # set once this row's prefill fully committed (slot activated);
    #                     step()'s failure-isolation retry skips done rows (a split
    #                     batch can succeed group 1, then raise in group 2)


@dataclasses.dataclass
class _PrefixEntry:
    """Metadata of a cached prefix span; its KV lives in the device-side prefix pool
    at row `index` (so admission gathers any subset of prefixes in ONE program)."""

    index: int
    token_ids: List[int]
    next_pos: int  # M-RoPE position right after the span
    last_used: float = dataclasses.field(default_factory=time.time)

    @property
    def length(self) -> int:
        return len(self.token_ids)


class ServingEngine:
    """Continuous batching over `max_slots` concurrent sequences.

    Usage: submit(request) then poll/step; or start()/stop() for a background pump
    thread with results delivered to the callback or collected via get_completion.
    """

    def __init__(
        self,
        params,
        cfg: VLMConfig,
        *,
        max_slots: int = 8,
        max_seq_len: int = 2048,
        decode_chunk: int = 8,
        cache_dtype=None,
        length_buckets: Sequence[int] = DEFAULT_LENGTH_BUCKETS,
        patch_buckets: Sequence[int] = ENGINE_PATCH_BUCKETS,
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len
        self.decode_chunk = decode_chunk
        self.length_buckets = tuple(b for b in length_buckets if b <= max_seq_len)
        self.patch_buckets = patch_buckets
        # Admission debounce: when requests trickle in (the submitter thread is still
        # encoding prompts 2..N when request 1 lands), wait this long for stragglers so
        # a burst becomes ONE batched prefill instead of a 1-row + (N-1)-row split.
        self.admission_debounce_s = 0.012
        # Admission coalescing: while other slots are decoding, hold admissions until
        # at least this many rows are ready (each prefill batch has a fixed dispatch +
        # ViT cost; trickled single-row admissions fragment it). 1 = admit eagerly.
        self.admit_min_batch = 1
        # Compact-prefill row-count buckets (clipped to max_slots): each value is a
        # distinct compiled program per (S, n_emb) — keep SMALL where compiles are
        # expensive (axon remote compile: minutes per shape).
        self.row_buckets = (4, 8, 16, 32, 64, 128, 256)
        dtype = jnp.dtype(cache_dtype) if cache_dtype is not None else jnp.dtype(cfg.dtype)
        # int8 KV composes with the prefix pool: the pool stores int8 values AND the
        # per-token scale rows (harvest/apply copy both), so image-block prefix reuse
        # survives in the int8-cache serving config.
        self._kv_int8 = dtype == jnp.int8
        self.cache = KVCache.create(cfg.text, max_slots, max_seq_len, dtype)
        self.cur_tokens = jnp.zeros((max_slots,), jnp.int32)
        self.next_pos = jnp.zeros((max_slots,), jnp.int32)  # M-RoPE position
        self.active = np.zeros((max_slots,), bool)
        self.slots: List[_Slot] = [_Slot() for _ in range(max_slots)]
        self.held: Dict[str, int] = {}  # request_id -> held slot index
        self.queue: "queue.Queue" = queue.Queue()  # Request | Continuation
        # ids currently inside a scheduler tick (pulled from the queue but not yet
        # visible in slots) — cancel_prefix must see these as in-flight
        self._in_admission: set = set()
        self.results: Dict[str, Completion] = {}
        self._results_cond = threading.Condition()
        self._key = jax.random.key(seed)
        self._stop_tokens = (cfg.tokens.eos, cfg.tokens.endoftext)
        self._prefill_fns: Dict[Tuple, Callable] = {}
        # Decode attend-span bucketing: attention reads only a STATIC prefix slice of
        # the cache (decoder attend_len) covering the live rows' max extent + chunk —
        # e.g. stage-1 decode of a zoom episode never touches rows past ~1024 of a
        # 2048 allocation. One compiled program per (row bucket, attend) pair; () to
        # disable. None (full span) is always available as the fallback.
        self.decode_attend_buckets = tuple(
            b for b in (512, 1024, 1536) if b < max_seq_len
        )
        self._decode_full_fns: Dict[Optional[int], Callable] = {}
        # Decode row-compaction (vLLM's "step only live seqs" property): when the
        # live-slot count fits a bucket < max_slots, the decode chunk gathers those
        # rows' cache, scans at batch R, and scatters back — cache-read bytes scale
        # with live rows. Each bucket is a separate compiled program (precompile
        # covers them); () disables compaction.
        self.decode_row_buckets = tuple(sorted({
            b for b in (
                -(-max_slots // 4 // 4) * 4 if max_slots >= 16 else max(1, max_slots // 2),
                -(-max_slots // 2 // 4) * 4 if max_slots >= 16 else max(1, max_slots // 2),
                -(-(3 * max_slots) // 4 // 4) * 4 if max_slots >= 16 else max(1, max_slots // 2),
            ) if 0 < b < max_slots
        }))
        self._decode_compact_fns: Dict[Tuple[int, Optional[int]], Callable] = {}
        self.prefix_store: Dict[str, _PrefixEntry] = {}
        self.max_prefixes = 64  # pool rows (~12 MB/row at 3B scale / 512-token cap)
        self.prefix_cap = 512  # longest cacheable prefix span (tokens)
        # Explicit free-list of pool rows: len(prefix_store) is NOT a safe allocator —
        # a duplicate save of a live key would burn a fresh index without growing the
        # dict, and the next distinct key would then alias a live row's KV.
        self._free_prefix_rows = list(range(self.max_prefixes - 1, -1, -1))
        self._ppool = None  # lazy (k, v, ks|None, vs|None) tuples of (P, Hkv, cap[, D])
        # ViT compiled separately (keyed by patch bucket via jit shape caching) so every
        # prompt-shape variant of the pool prefill shares one compiled vision tower
        self._vit_fn = jax.jit(
            lambda params, pv, meta, win_mode=0: compute_vision_embeds(
                params, self.cfg, pv, meta, win_mode=win_mode
            ),
            static_argnums=(3,),
        )
        self._pump_thread: Optional[threading.Thread] = None
        self._running = False
        # Optional completion hook (called from the pump thread inside _finish —
        # keep it O(1), e.g. queue.put): lets a driver consume completions without
        # one blocked get_completion() thread per request (on a 1-core host, N
        # collector threads doing PIL work starve the scheduler via the GIL).
        self.on_completion: Optional[Callable[[Completion], None]] = None
        # Optional incremental-token hook (pump thread, once per decode chunk per live
        # row, and once for the prefill's first token): on_tokens(request_id, new_toks).
        # Tokens already exclude the stop token (mirrors Completion.token_ids). Keep it
        # O(1) (queue.put) — it runs inside the scheduler tick. Powers SSE streaming
        # on the OpenAI endpoint (serve/server.py).
        self.on_tokens: Optional[Callable[[str, List[int]], None]] = None
        self.stats = {"completed": 0, "decode_steps": 0, "prefills": 0,
                      "prefill_rows": 0, "prefix_hits": 0, "prefix_saves": 0}
        # wall-clock phase accounting (host thread time, includes device wait):
        # where do engine ticks actually go? read via stats_timing()
        self._phase_s = collections.defaultdict(float)
        self._latencies = collections.deque(maxlen=1024)  # submit -> completion, seconds

    def stats_timing(self):
        """Cumulative seconds per engine phase (prefill_host, vit, prefix_apply,
        prefill_device, decode_device, retire) — diagnosis for the engine-vs-wave gap."""
        return {k: round(v, 3) for k, v in sorted(self._phase_s.items())}

    def latency_percentiles(self):
        """p50/p95 request latency over the last 1024 completions (the north-star
        metric's second half: queries/sec/chip AND p50 latency, BASELINE.json)."""
        if not self._latencies:
            return {"p50_latency_s": None, "p95_latency_s": None}
        arr = np.asarray(self._latencies)
        return {
            "p50_latency_s": round(float(np.percentile(arr, 50)), 3),
            "p95_latency_s": round(float(np.percentile(arr, 95)), 3),
        }

    # ------------------------------------------------------------------
    # jitted device programs
    # ------------------------------------------------------------------

    def _pool_prefill(
        self, params, slot_idx, ids, chunk_lens, keep_lens, pos, vision_embeds,
        cache, cur_tokens, next_pos, new_next_pos, temps, key,
    ):
        """Row-compacted chunk-prefill into the slot pool.

        slot_idx: (R,) pool rows of this batch (R a small bucket, NOT max_slots —
        an admission of 4 rows used to pay a full (max_slots, S) forward, ~8x the
        FLOPs; the dominant engine-vs-wave gap). Padding rows carry slot_idx ==
        max_slots: their gathers clamp (harmless — chunk_lens 0 masks everything)
        and every scatter-back DROPS them. The per-row (R x 36-layer KV) gather +
        scatter costs ~2 x 57 MB x R of HBM traffic (~1.5 ms at R=8) — noise next
        to the saved forward.

        Returns (cache, cur_tokens, next_pos, first_tokens) with on-device sampling.
        """
        R, S = ids.shape
        T = cache.k[0].shape[2]
        # gather the participating rows' cache (scales too in int8 mode)
        cidx = jnp.clip(slot_idx, 0, cache.k[0].shape[0] - 1)
        gk = tuple(k[cidx] for k in cache.k)
        gv = tuple(v[cidx] for v in cache.v)
        quant = cache.kscale is not None
        gcache = KVCache(
            k=gk, v=gv, length=keep_lens,
            kscale=tuple(s[cidx] for s in cache.kscale) if quant else None,
            vscale=tuple(s[cidx] for s in cache.vscale) if quant else None,
        )
        attn_positions = keep_lens[:, None] + jnp.arange(S)[None]
        attn_valid = jnp.arange(S)[None] < chunk_lens[:, None]
        # pads write to slot T -> dropped by the kv scatter
        write_pos = jnp.where(attn_valid, attn_positions, T)
        logits, gcache = vlm_forward(
            params, self.cfg, ids, pos,
            vision_embeds=vision_embeds,
            attn_positions=attn_positions, attn_valid=attn_valid,
            cache=gcache, update_cache_len=False,
            logit_index=jnp.maximum(chunk_lens - 1, 0),
            write_pos=write_pos,
            # bf16 cache: XLA's fused attention beats the Pallas causal kernel at
            # our prefill sizes (measured on-TPU). int8 cache: the XLA path takes a
            # transient DEQUANTIZED copy of the live KV per layer — the flash kernel
            # streams int8 + scales instead, so quant forces flash.
            use_flash=quant,
        )
        # scatter rows back (padding rows: slot_idx == max_slots -> dropped)
        new_k = tuple(
            k.at[slot_idx].set(g, mode="drop") for k, g in zip(cache.k, gcache.k)
        )
        new_v = tuple(
            v.at[slot_idx].set(g, mode="drop") for v, g in zip(cache.v, gcache.v)
        )
        new_len = cache.length.at[slot_idx].set(keep_lens + chunk_lens, mode="drop")
        cache = cache._replace(
            k=new_k, v=new_v, length=new_len,
            kscale=tuple(s.at[slot_idx].set(g, mode="drop")
                         for s, g in zip(cache.kscale, gcache.kscale)) if quant else None,
            vscale=tuple(s.at[slot_idx].set(g, mode="drop")
                         for s, g in zip(cache.vscale, gcache.vscale)) if quant else None,
        )
        greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        temp = jnp.maximum(temps, 1e-4)[:, None]
        sampled = jax.random.categorical(key, logits / temp, axis=-1).astype(jnp.int32)
        tok = jnp.where(temps <= 0.0, greedy_tok, sampled)
        cur_tokens = cur_tokens.at[slot_idx].set(tok, mode="drop")
        next_pos = next_pos.at[slot_idx].set(new_next_pos, mode="drop")
        return cache, cur_tokens, next_pos, tok

    def _apply_prefixes(self, cache, ppool, entry_idx, tp, mask):
        """Seed masked slots' [0, tp_b) cache regions from prefix-pool rows entry_idx.

        One program regardless of how many distinct prefixes the admission batch uses —
        the per-slot source row is a device-side gather from the pool. In int8-cache
        mode the pool carries the per-token scales too (ppool[2]/[3]), so prefix reuse
        and the int8 KV cache compose instead of silently disabling each other."""
        ppool_k, ppool_v, ppool_ks, ppool_vs = ppool
        cap = min(ppool_k[0].shape[2], cache.k[0].shape[2])
        m = (
            mask[:, None, None, None]
            & (jnp.arange(cap)[None, None, :, None] < tp[:, None, None, None])
        )
        new_k = tuple(
            k.at[:, :, :cap, :].set(
                jnp.where(m, pk[entry_idx][:, :, :cap, :].astype(k.dtype), k[:, :, :cap, :])
            )
            for k, pk in zip(cache.k, ppool_k)
        )
        new_v = tuple(
            v.at[:, :, :cap, :].set(
                jnp.where(m, pv[entry_idx][:, :, :cap, :].astype(v.dtype), v[:, :, :cap, :])
            )
            for v, pv in zip(cache.v, ppool_v)
        )
        new_ks = new_vs = None
        if ppool_ks is not None:
            m3 = m[..., 0]  # (B, 1, cap) mask for the (B, Hkv, T) scale arrays
            new_ks = tuple(
                s.at[:, :, :cap].set(jnp.where(m3, ps[entry_idx][:, :, :cap], s[:, :, :cap]))
                for s, ps in zip(cache.kscale, ppool_ks)
            )
            new_vs = tuple(
                s.at[:, :, :cap].set(jnp.where(m3, ps[entry_idx][:, :, :cap], s[:, :, :cap]))
                for s, ps in zip(cache.vscale, ppool_vs)
            )
        return cache._replace(
            k=new_k, v=new_v,
            kscale=new_ks if new_ks is not None else cache.kscale,
            vscale=new_vs if new_vs is not None else cache.vscale,
        )

    def _get_decode_fn(self, attend):
        fn = self._decode_full_fns.get(attend)
        if fn is None:
            fn = self._decode_full_fns[attend] = jax.jit(
                partial(self._decode_steps, n_steps=self.decode_chunk, attend_len=attend),
                donate_argnums=(0,),
            )
        return fn

    def _get_decode_compact_fn(self, R, attend):
        fn = self._decode_compact_fns.get((R, attend))
        if fn is None:
            fn = self._decode_compact_fns[(R, attend)] = jax.jit(
                partial(self._decode_steps_compact, n_steps=self.decode_chunk,
                        attend_len=attend),
                donate_argnums=(0,),
            )
        return fn

    def _attend_for(self, live):
        """STATIC attention span bucket covering the live rows' cache extents after
        this chunk (prompt + generated so far + chunk + slack), or None (full span).
        Host-side slot state is the bound; held/idle rows are not stepped (compact)
        or produce ignored garbage (full branch), so only live rows constrain it."""
        if not self.decode_attend_buckets or not live:
            return None
        need = max(
            self.slots[i].prompt_len + len(self.slots[i].generated) for i in live
        ) + self.decode_chunk + 2
        return next((a for a in self.decode_attend_buckets if need <= a), None)

    def _decode_steps(self, cache, cur_tokens, next_pos, active, temps, key, params, *, n_steps, attend_len=None):
        """Run n_steps decode for all slots; inactive slots write garbage into their own
        cache region only. Returns (cache, cur_tokens, next_pos, tokens (B, n_steps))."""
        B = self.max_slots
        pad_id = self.cfg.tokens.pad

        def body(carry, _):
            cache, cur, pos, key = carry
            pos3 = jnp.broadcast_to(pos[None, :, None], (3, B, 1))
            old_len = cache.length
            logits, cache = vlm_forward(
                params, self.cfg, cur[:, None], pos3,
                attn_positions=cache.length[:, None], cache=cache,
                attend_len=attend_len,
            )
            # held/idle rows must not grow their length (their garbage token writes
            # would eventually clamp at the cache tail and shadow valid kv)
            cache = cache._replace(length=jnp.where(active, cache.length, old_len))
            logits = logits[:, 0]
            key, sub = jax.random.split(key)
            greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            temp = jnp.maximum(temps, 1e-4)[:, None]
            sampled = jax.random.categorical(sub, logits / temp, axis=-1).astype(jnp.int32)
            tok = jnp.where(temps <= 0.0, greedy_tok, sampled)
            tok = jnp.where(active, tok, pad_id)
            return (cache, tok, pos + 1, key), tok

        (cache, cur, pos, key), toks = jax.lax.scan(
            body, (cache, cur_tokens, next_pos, key), None, length=n_steps
        )
        return cache, cur, pos, toks.T  # (B, n_steps)

    def _decode_steps_compact(
        self, cache, slot_idx, cur_tokens, next_pos, active, temps, key, params, *,
        n_steps, attend_len=None
    ):
        """Row-compacted decode chunk: gather the R active slots' cache rows ONCE,
        run the n_steps scan at batch R, scatter back (same slot_idx pattern as
        _pool_prefill). Decode attention reads scale with LIVE rows, not max_slots —
        at the bench's measured 64% occupancy the full-batch chunk burns ~36% of its
        cache-read bytes on finished rows. The per-chunk gather+scatter costs
        2 x R/B of one cache pass, amortized over n_steps (~0.4 ms/step-equivalent
        at R=40/chunk=32 — small next to the ~2 ms/step it saves).

        slot_idx: (R,) pool rows; padding rows carry max_slots (gathers clamp to row
        0, active=False masks their tokens, every scatter-back DROPS them).

        active/temps arrive already compacted (R,) from the host (host-side state);
        cur_tokens/next_pos are the full (B,) device arrays, gathered/scattered here.
        Returns (cache, full cur_tokens, full next_pos, tokens (R, n_steps))."""
        B = self.max_slots
        cidx = jnp.clip(slot_idx, 0, B - 1)
        quant = cache.kscale is not None
        gcache = KVCache(
            k=tuple(k[cidx] for k in cache.k),
            v=tuple(v[cidx] for v in cache.v),
            length=cache.length[cidx],
            kscale=tuple(s[cidx] for s in cache.kscale) if quant else None,
            vscale=tuple(s[cidx] for s in cache.vscale) if quant else None,
        )
        full_cur, full_pos = cur_tokens, next_pos
        cur_tokens = cur_tokens[cidx]
        next_pos = next_pos[cidx]
        R = slot_idx.shape[0]
        pad_id = self.cfg.tokens.pad

        def body(carry, _):
            gcache, cur, pos, key = carry
            pos3 = jnp.broadcast_to(pos[None, :, None], (3, R, 1))
            old_len = gcache.length
            logits, gcache = vlm_forward(
                params, self.cfg, cur[:, None], pos3,
                attn_positions=gcache.length[:, None], cache=gcache,
                attend_len=attend_len,
            )
            gcache = gcache._replace(length=jnp.where(active, gcache.length, old_len))
            logits = logits[:, 0]
            key, sub = jax.random.split(key)
            greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            temp = jnp.maximum(temps, 1e-4)[:, None]
            sampled = jax.random.categorical(sub, logits / temp, axis=-1).astype(jnp.int32)
            tok = jnp.where(temps <= 0.0, greedy_tok, sampled)
            tok = jnp.where(active, tok, pad_id)
            return (gcache, tok, pos + 1, key), tok

        (gcache, cur, pos, key), toks = jax.lax.scan(
            body, (gcache, cur_tokens, next_pos, key), None, length=n_steps
        )
        cache = cache._replace(
            k=tuple(k.at[slot_idx].set(g, mode="drop") for k, g in zip(cache.k, gcache.k)),
            v=tuple(v.at[slot_idx].set(g, mode="drop") for v, g in zip(cache.v, gcache.v)),
            length=cache.length.at[slot_idx].set(gcache.length, mode="drop"),
            kscale=tuple(s.at[slot_idx].set(g, mode="drop")
                         for s, g in zip(cache.kscale, gcache.kscale)) if quant else None,
            vscale=tuple(s.at[slot_idx].set(g, mode="drop")
                         for s, g in zip(cache.vscale, gcache.vscale)) if quant else None,
        )
        full_cur = full_cur.at[slot_idx].set(cur, mode="drop")
        full_pos = full_pos.at[slot_idx].set(pos, mode="drop")
        return cache, full_cur, full_pos, toks.T  # toks (R, n_steps)

    def precompile(self, *, row_widths: Optional[Sequence[int]] = None,
                   lengths: Optional[Sequence[int]] = None,
                   patch_counts: Optional[Sequence[int]] = None,
                   pixel_dtype=np.uint8,
                   progress: Optional[Callable[[str], None]] = None):
        """Deterministically compile every device program the engine can hit.

        Engine prefill shapes are TIMING-DEPENDENT (admission batching), so a
        stochastic warmup never reliably covers them — and on remote-compile
        infrastructure each miss costs minutes mid-serving. This walks the full
        (row-width x length-bucket x patch-bucket) grid with INERT inputs: slot_idx
        points past the pool so every scatter drops, chunk_lens=0 masks all
        attention — engine state is untouched. Also compiles the decode chunk, the
        ViT per patch bucket, and the prefix apply/harvest programs."""
        cfg = self.cfg
        widths = list(row_widths) if row_widths is not None else (
            [r for r in self.row_buckets if r <= self.max_slots] + [self.max_slots]
        )
        widths = sorted(set(widths))
        lens = list(lengths) if lengths is not None else list(self.length_buckets)
        patches = list(patch_counts) if patch_counts is not None else list(self.patch_buckets)
        emb_per_patch = 1.0 / cfg.vision.merge_unit
        for npatch in patches:
            if npatch == 0:
                continue
            if progress:
                progress(f"vit[{npatch}]")
            pv = jnp.zeros((npatch, cfg.vision.patch_dim), pixel_dtype)
            # cover both windowed-attention programs: (1, 4, n/4) has edge windows
            # (win_mode 1, typical resized stage-1 images); (1, 16, n/16) is uniform
            # (win_mode 2, exact-512px crops) — llm grid 8 x n/32, both % 4 == 0
            for grid in ((1, 4, npatch // 4), (1, 16, npatch // 16)):
                meta = vision_metadata([grid], cfg.vision, pad_to=npatch)
                meta_dev = vision_meta_to_device(meta)
                jax.block_until_ready(
                    self._vit_fn(self.params, pv, meta_dev, meta.win_mode)
                )
        for RB in widths:
            for S in lens:
                for npatch in patches:
                    n_emb = int(npatch * emb_per_patch)
                    key = ("pool", RB, S, n_emb)
                    if key in self._prefill_fns:
                        continue
                    if progress:
                        progress(f"pool{key}")
                    self._prefill_fns[key] = jax.jit(self._pool_prefill, donate_argnums=(7,))
                    ve = (jnp.zeros((n_emb, cfg.text.hidden_size), jnp.dtype(cfg.dtype))
                          if n_emb else None)
                    self._key, sub = jax.random.split(self._key)
                    self.cache, self.cur_tokens, self.next_pos, _tok = self._prefill_fns[key](
                        self.params,
                        jnp.full((RB,), self.max_slots, jnp.int32),  # all rows dropped
                        jnp.full((RB, S), cfg.tokens.pad, jnp.int32),
                        jnp.zeros((RB,), jnp.int32), jnp.zeros((RB,), jnp.int32),
                        jnp.ones((3, RB, S), jnp.int32), ve,
                        self.cache, self.cur_tokens, self.next_pos,
                        jnp.zeros((RB,), jnp.int32), jnp.zeros((RB,), jnp.float32), sub,
                    )
        attends = list(self.decode_attend_buckets) + [None]
        for attend in attends:
            if progress:
                progress(f"decode[attend={attend}]")
            self._key, sub = jax.random.split(self._key)
            self.cache, self.cur_tokens, self.next_pos, _ = self._get_decode_fn(attend)(
                self.cache, self.cur_tokens, self.next_pos,
                jnp.zeros((self.max_slots,), bool), jnp.zeros((self.max_slots,), jnp.float32),
                sub, self.params,
            )
        for R in self.decode_row_buckets:
            for attend in attends:
                if progress:
                    progress(f"decode_compact[{R},attend={attend}]")
                self._key, sub = jax.random.split(self._key)
                # all rows padded (slot_idx == max_slots): gathers clamp, scatters drop
                self.cache, self.cur_tokens, self.next_pos, _ = self._get_decode_compact_fn(R, attend)(
                    self.cache, jnp.full((R,), self.max_slots, jnp.int32),
                    self.cur_tokens, self.next_pos,
                    jnp.zeros((R,), bool), jnp.zeros((R,), jnp.float32), sub, self.params,
                )
        # prefix programs (apply + harvest at the prefix cap)
        self._ensure_ppool()
        if "apply_prefixes" not in self._prefill_fns:
            self._prefill_fns["apply_prefixes"] = jax.jit(self._apply_prefixes, donate_argnums=(0,))
        if progress:
            progress("prefix_apply")
        self.cache = self._prefill_fns["apply_prefixes"](
            self.cache, self._ppool,
            jnp.zeros((self.max_slots,), jnp.int32), jnp.zeros((self.max_slots,), jnp.int32),
            jnp.zeros((self.max_slots,), bool),  # mask False: no-op
        )
        jax.block_until_ready(self.cache.length)
        # fresh state buffers: precompile churned the originals through donation
        # chains; serving restarts from clean allocations
        self.reset_state()

    def reset_state(self):
        """Reallocate the slot pool's device state (drops all in-flight work)."""
        dtype = self.cache.k[0].dtype
        self.cache = KVCache.create(self.cfg.text, self.max_slots, self.max_seq_len, dtype)
        self.cur_tokens = jnp.zeros((self.max_slots,), jnp.int32)
        self.next_pos = jnp.zeros((self.max_slots,), jnp.int32)
        self.active = np.zeros((self.max_slots,), bool)
        self.slots = [_Slot() for _ in range(self.max_slots)]
        self.held.clear()
        jax.block_until_ready(self.cache.length)

    # ------------------------------------------------------------------
    # prefix KV cache (lazy, keyed store)
    # ------------------------------------------------------------------

    def _harvest_prefix(self, cache, ppool, slot, idx, Tp: int):
        """Copy slot `slot`'s [0, Tp) KV (and int8 scales) into prefix-pool row idx
        (jitted per Tp)."""
        ppool_k, ppool_v, ppool_ks, ppool_vs = ppool
        cap = ppool_k[0].shape[2]
        n = min(Tp, cap)

        def copy_row(pool, src):
            return jax.lax.dynamic_update_slice(
                pool,
                jax.lax.dynamic_slice(
                    src, (slot, 0, 0, 0), (1, src.shape[1], n, src.shape[3])
                ).astype(pool.dtype),
                (idx, 0, 0, 0),
            )

        def copy_scale_row(pool, src):
            return jax.lax.dynamic_update_slice(
                pool,
                jax.lax.dynamic_slice(src, (slot, 0, 0), (1, src.shape[1], n)),
                (idx, 0, 0),
            )

        new_k = tuple(copy_row(pk, k) for k, pk in zip(cache.k, ppool_k))
        new_v = tuple(copy_row(pv, v) for v, pv in zip(cache.v, ppool_v))
        new_ks = new_vs = None
        if ppool_ks is not None:
            new_ks = tuple(copy_scale_row(ps, s) for s, ps in zip(cache.kscale, ppool_ks))
            new_vs = tuple(copy_scale_row(ps, s) for s, ps in zip(cache.vscale, ppool_vs))
        return new_k, new_v, new_ks, new_vs

    def _ensure_ppool(self):
        if self._ppool is None:
            tc = self.cfg.text
            dtype = self.cache.k[0].dtype
            shape = (self.max_prefixes, tc.num_key_value_heads, self.prefix_cap, tc.head_dim)
            scales = None, None
            if self._kv_int8:
                sshape = shape[:3]
                scales = (
                    tuple(jnp.zeros(sshape, jnp.bfloat16) for _ in self.cache.k),
                    tuple(jnp.zeros(sshape, jnp.bfloat16) for _ in self.cache.v),
                )
            self._ppool = (
                tuple(jnp.zeros(shape, dtype) for _ in self.cache.k),
                tuple(jnp.zeros(shape, dtype) for _ in self.cache.v),
                scales[0],
                scales[1],
            )

    def _store_prefix(self, key: str, slot: int, token_ids: List[int], next_pos: int):
        Tp = len(token_ids)
        if Tp > self.prefix_cap:
            return
        if key in self.prefix_store:
            # already cached (e.g. two same-prefix requests admitted in one batch both
            # missed and both carry save_prefix) — keep the existing entry
            self.prefix_store[key].last_used = time.time()
            return
        self._ensure_ppool()
        if self._free_prefix_rows:
            idx = self._free_prefix_rows.pop()
        else:
            lru = min(self.prefix_store, key=lambda k: self.prefix_store[k].last_used)
            idx = self.prefix_store.pop(lru).index
        fn_key = ("harvest_prefix", Tp)
        if fn_key not in self._prefill_fns:
            self._prefill_fns[fn_key] = jax.jit(
                partial(self._harvest_prefix, Tp=Tp), donate_argnums=(1,)
            )
        self._ppool = self._prefill_fns[fn_key](self.cache, self._ppool, slot, idx)
        self.prefix_store[key] = _PrefixEntry(index=idx, token_ids=list(token_ids), next_pos=next_pos)
        self.stats["prefix_saves"] += 1

    # ------------------------------------------------------------------
    # host-side scheduler
    # ------------------------------------------------------------------

    def submit(self, request: Request):
        if len(request.token_ids) + request.max_tokens > self.max_seq_len:
            raise ValueError(
                f"request {request.request_id}: prompt ({len(request.token_ids)}) + "
                f"max_tokens ({request.max_tokens}) exceeds max_seq_len ({self.max_seq_len})"
            )
        # reject at the submission boundary (the caller gets a clean error, e.g. an
        # HTTP 400) instead of poisoning an admission batch in the pump. A prefix-KV
        # request only prefills its post-prefix chunk on a hit, so the guard applies
        # to that chunk — a prefix MISS with an over-bucket full prompt still fails
        # safely via the pump's admission containment (finish_reason="error").
        chunk_len = len(request.token_ids)
        if request.prefix_key and request.prefix_len:
            chunk_len -= request.prefix_len
        if chunk_len > self.length_buckets[-1]:
            raise ValueError(
                f"request {request.request_id}: prefill chunk ({chunk_len}) "
                f"exceeds the largest prefill bucket ({self.length_buckets[-1]})"
            )
        self.queue.put(request)

    def submit_continuation(self, continuation: Continuation):
        """Queue a continuation of a hold_slot request (the stage-2 zoom pattern)."""
        self.queue.put(continuation)

    def release_slot(self, request_id: str):
        """Free a held slot without continuing it."""
        slot_idx = self.held.pop(request_id, None)
        if slot_idx is not None:
            self.slots[slot_idx] = _Slot()

    def cancel_prefix(self, prefix: str, timeout: float = 300.0):
        """Cancel every request whose id starts with `prefix`: drop queued items,
        let in-flight rows finish, then free their held slots and unread results.

        A driver tearing down a rollout mid-flight against a PERSISTENT engine
        (train/grpo.py error path) needs this: a request still decoding at teardown
        would complete AFTER a naive held/results sweep and — with hold_slot=True —
        re-insert a held slot that leaks a pool row forever. Cancellation therefore
        WAITS for in-flight matching work (including rows inside a scheduler
        admission, tracked via _in_admission) to drain before sweeping."""
        def drain_queue():
            keep, dropped = [], 0
            while True:
                try:
                    item = self.queue.get_nowait()
                except queue.Empty:
                    break
                if item.request_id.startswith(prefix):
                    dropped += 1
                else:
                    keep.append(item)
            for it in keep:
                self.queue.put(it)
            return dropped

        def in_flight():
            if any(r.startswith(prefix) for r in self._in_admission):
                return True
            return any(
                self.active[i] and s.request is not None
                and s.request.request_id.startswith(prefix)
                for i, s in enumerate(self.slots)
            )

        drain_queue()
        deadline = time.time() + timeout
        clean = 0
        while time.time() < deadline:
            if in_flight():
                clean = 0
                if self._running:
                    time.sleep(0.02)
                else:
                    self.step()  # no pump thread: tick the scheduler ourselves
                continue
            # two consecutive clean observations separated by a tick close the
            # window where an item sits between queue.get and _in_admission
            clean += 1
            if clean >= 2:
                break
            time.sleep(0.02) if self._running else self.step()
        drain_queue()  # a continuation enqueued by a late completion's consumer
        for key in [k for k in self.held if k.startswith(prefix)]:
            self.release_slot(key)
        with self._results_cond:
            for key in [k for k in self.results if k.startswith(prefix)]:
                self.results.pop(key, None)

    def _prep_request(self, req: Request, slot_idx: int) -> _PrefillRow:
        if req.prefix_key and req.prefix_len:
            prefix_ids = list(req.token_ids[: req.prefix_len])
            entry = self.prefix_store.get(req.prefix_key)
            if entry is not None and entry.token_ids == prefix_ids:
                entry.last_used = time.time()
                self.stats["prefix_hits"] += 1
                return _PrefillRow(
                    slot=slot_idx, request=req,
                    chunk_ids=list(req.token_ids[req.prefix_len:]),
                    images=req.images[req.n_prefix_images:],
                    keep_len=entry.length, start_pos=entry.next_pos,
                    prompt_len=len(req.token_ids), use_prefix=req.prefix_key,
                )
            # miss: full prefill now, harvest the prefix KV for later requests
            prefix_grids = [g for _, g in req.images[: req.n_prefix_images]]
            _, prefix_next = mrope_position_ids(
                np.asarray(prefix_ids, np.int32), prefix_grids,
                image_pad_id=self.cfg.tokens.image_pad,
                merge_size=self.cfg.vision.spatial_merge_size,
            )
            return _PrefillRow(
                slot=slot_idx, request=req, chunk_ids=list(req.token_ids),
                images=req.images, keep_len=0, start_pos=0,
                prompt_len=len(req.token_ids), save_prefix=req.prefix_key,
                prefix_next_pos=int(prefix_next),
            )
        return _PrefillRow(
            slot=slot_idx, request=req, chunk_ids=list(req.token_ids), images=req.images,
            keep_len=0, start_pos=0, prompt_len=len(req.token_ids),
        )

    def _prep_continuation(self, c: Continuation) -> _PrefillRow:
        slot_idx = self.held.pop(c.parent_request_id)
        slot = self.slots[slot_idx]
        # cache holds prompt + all generated EXCEPT the last produced token
        in_cache = max(len(slot.generated) - 1, 0)
        kept = min(c.kept_tokens, len(slot.generated))
        extra = slot.generated[in_cache:kept] if kept > in_cache else []
        chunk_ids = list(extra) + list(c.chunk_ids)
        kept_cached = min(kept, in_cache)
        keep_len = slot.prompt_len + kept_cached
        start_pos = slot.prompt_next_pos + kept_cached
        req = Request(
            request_id=c.request_id, token_ids=chunk_ids, images=c.images,
            max_tokens=c.max_tokens, temperature=c.temperature, hold_slot=c.hold_slot,
        )
        return _PrefillRow(
            slot=slot_idx, request=req, chunk_ids=chunk_ids, images=c.images,
            keep_len=keep_len, start_pos=start_pos,
            prompt_len=keep_len + len(chunk_ids),
        )

    def _run_prefill_batch(self, rows: List[_PrefillRow]):
        """One row-compacted pool prefill for up to max_slots prepared rows."""
        t_start = time.time()
        cfg = self.cfg
        # a burst whose images exceed the largest patch bucket (e.g. a cold first
        # round: every stage-1 admission carries a full image) splits greedily
        cap = self.patch_buckets[-1]
        total = sum(pv.shape[0] for r in rows for pv, _ in r.images)
        if total > cap and len(rows) > 1:
            group: List[_PrefillRow] = []
            acc = 0
            for r in rows:
                n = sum(pv.shape[0] for pv, _ in r.images)
                if group and acc + n > cap:
                    self._run_prefill_batch(group)
                    group, acc = [], 0
                group.append(r)
                acc += n
            if group:
                self._run_prefill_batch(group)
            return
        rows = sorted(rows, key=lambda r: r.slot)  # vision embeds splice in row order
        R = len(rows)
        # compact row-count bucket: prefill FLOPs scale with RB, not max_slots
        RB = next((r for r in self.row_buckets if R <= r <= self.max_slots),
                  self.max_slots)
        S = bucket(max(len(r.chunk_ids) for r in rows), self.length_buckets)
        ids = np.full((RB, S), cfg.tokens.pad, np.int32)
        chunk_lens = np.zeros((RB,), np.int32)
        keep_lens = np.zeros((RB,), np.int32)
        new_next = np.zeros((RB,), np.int32)
        pos = np.ones((3, RB, S), np.int32)
        temps = np.zeros((RB,), np.float32)
        # padding rows point past the pool: every scatter-back drops them
        slot_idx = np.full((RB,), self.max_slots, np.int32)
        all_pv, all_grids = [], []
        prefix_rows: Dict[str, List[int]] = {}
        for j, r in enumerate(rows):
            n = len(r.chunk_ids)
            slot_idx[j] = r.slot
            ids[j, :n] = r.chunk_ids
            chunk_lens[j] = n
            keep_lens[j] = r.keep_len
            temps[j] = r.request.temperature
            if r.use_prefix:
                prefix_rows.setdefault(r.use_prefix, []).append(r.slot)
            grids = [g for _, g in r.images]
            p, nxt = mrope_chunk_position_ids(
                np.asarray(r.chunk_ids), grids, r.start_pos,
                image_pad_id=cfg.tokens.image_pad, merge_size=cfg.vision.spatial_merge_size,
            )
            pos[:, j, :n] = p
            new_next[j] = nxt
            all_pv.extend(x for x, _ in r.images)
            all_grids.extend(grids)

        self._phase_s["prefill_host_prep"] += time.time() - t_start
        t_dev = time.time()
        vision_embeds = None
        n_emb = 0
        if all_pv:
            t_vit = time.time()
            pv = np.concatenate(all_pv, axis=0)
            n_patches = bucket(pv.shape[0], self.patch_buckets)
            meta = vision_metadata(all_grids, cfg.vision, pad_to=n_patches)
            if n_patches > pv.shape[0]:
                pv = np.concatenate([pv, np.zeros((n_patches - pv.shape[0], pv.shape[1]), pv.dtype)])
            meta_dev = vision_meta_to_device(meta)
            # ViT runs as its own program (one compile per patch bucket, shared by all
            # prompt-shape variants of the pool prefill)
            vision_embeds = self._vit_fn(self.params, jnp.asarray(pv), meta_dev, meta.win_mode)
            n_emb = vision_embeds.shape[0]
            self._phase_s["prefill_vit_dispatch"] += time.time() - t_vit

        if prefix_rows:
            B = self.max_slots
            if "apply_prefixes" not in self._prefill_fns:
                self._prefill_fns["apply_prefixes"] = jax.jit(
                    self._apply_prefixes, donate_argnums=(0,)
                )
            pmask = np.zeros((B,), bool)
            entry_idx = np.zeros((B,), np.int32)
            tp = np.zeros((B,), np.int32)
            for pkey, slots_list in prefix_rows.items():
                entry = self.prefix_store[pkey]
                for b in slots_list:
                    pmask[b] = True
                    entry_idx[b] = entry.index
                    tp[b] = entry.length
            self.cache = self._prefill_fns["apply_prefixes"](
                self.cache, self._ppool,
                jnp.asarray(entry_idx), jnp.asarray(tp), jnp.asarray(pmask),
            )

        key = ("pool", RB, S, n_emb)
        if key not in self._prefill_fns:
            self.stats["prefill_compiles"] = self.stats.get("prefill_compiles", 0) + 1
            self._prefill_fns[key] = jax.jit(self._pool_prefill, donate_argnums=(7,))
        t_pool = time.time()
        self._key, sub = jax.random.split(self._key)
        self.cache, self.cur_tokens, self.next_pos, tok = self._prefill_fns[key](
            self.params, jnp.asarray(slot_idx), jnp.asarray(ids), jnp.asarray(chunk_lens),
            jnp.asarray(keep_lens), jnp.asarray(pos), vision_embeds,
            self.cache, self.cur_tokens, self.next_pos,
            jnp.asarray(new_next), jnp.asarray(temps), sub,
        )
        self._phase_s["prefill_pool_dispatch"] += time.time() - t_pool
        self.stats["prefills"] += 1
        self.stats["prefill_rows"] += len(rows)
        t_store = time.time()
        for r in rows:
            if r.save_prefix:
                self._store_prefix(
                    r.save_prefix, r.slot,
                    list(r.request.token_ids[: r.request.prefix_len]), r.prefix_next_pos,
                )
        self._phase_s["prefill_store_dispatch"] += time.time() - t_store
        t_rb = time.time()
        first = np.asarray(tok)  # one small readback per BATCH, not per request
        self._phase_s["prefill_readback_wait"] += time.time() - t_rb
        # device total: ViT + prefix apply + pool prefill + prefix harvest, measured
        # to the blocking first-token readback
        self._phase_s["prefill_device"] += time.time() - t_dev
        for j, r in enumerate(rows):
            b = r.slot
            t = int(first[j])
            slot = self.slots[b]
            slot.request = r.request
            slot.generated = [t]
            slot.remaining = r.request.max_tokens - 1
            slot.held = False
            slot.prompt_len = r.prompt_len
            slot.prompt_next_pos = int(new_next[j])
            self.active[b] = True
            r.done = True  # committed: failure-isolation retries must skip this row
            if self.on_tokens is not None and t not in self._stop_tokens:
                self.on_tokens(r.request.request_id, [t])
            if t in self._stop_tokens or slot.remaining <= 0:
                self._finish(b, "stop" if t in self._stop_tokens else "length")

    def _finish(self, slot_idx: int, reason: str):
        slot = self.slots[slot_idx]
        req = slot.request
        toks = slot.generated
        if reason == "stop" and toks and toks[-1] in self._stop_tokens:
            toks = toks[:-1]
        completion = Completion(
            request_id=req.request_id,
            token_ids=toks,
            finish_reason=reason,
            prompt_tokens=len(req.token_ids),
        )
        with self._results_cond:
            self.results[req.request_id] = completion
            self._results_cond.notify_all()
        if self.on_completion is not None:
            self.on_completion(completion)
        self.stats["completed"] += 1
        self._latencies.append(completion.created_at - req.enqueued_at)
        self.active[slot_idx] = False
        if req.hold_slot:
            slot.held = True
            self.held[req.request_id] = slot_idx
        else:
            self.slots[slot_idx] = _Slot()

    def _fail_admission(self, admissible, exc: Exception):
        """An admission batch whose prep/prefill raised (an over-bucket continuation
        chunk, an unexpected shape) must not kill the pump thread: every waiting
        client would then block forever on get_completion with zero diagnostics (the
        pre-fix failure mode). Error-complete each admitted item so callers unblock,
        and free any slot state the partial admission left behind."""
        import sys
        import traceback

        print(f"engine: admission batch failed ({exc!r}); "
              f"erroring {len(admissible)} request(s)", file=sys.stderr)
        traceback.print_exc(file=sys.stderr)
        for item, slot_idx in admissible:
            if isinstance(item, Continuation):
                slot_idx = self.held.pop(item.parent_request_id, None)
            if slot_idx is not None:
                self.active[slot_idx] = False
                self.slots[slot_idx] = _Slot()
            completion = Completion(request_id=item.request_id, token_ids=[],
                                    finish_reason="error", prompt_tokens=0)
            with self._results_cond:
                self.results[item.request_id] = completion
                self._results_cond.notify_all()
            if self.on_completion is not None:
                self.on_completion(completion)
            self.stats["errors"] = self.stats.get("errors", 0) + 1

    def _sweep_orphan_held(self):
        """Reset held slots no longer reachable through self.held: _prep_continuation
        pops self.held BEFORE its batch runs, so a failed admission would otherwise
        leak those slots. Called once per tick AFTER all admission retries (a sweep
        mid-retry could reset a slot whose solo retry is still pending)."""
        held_slots = set(self.held.values())
        for i, s in enumerate(self.slots):
            if s.held and i not in held_slots and not self.active[i]:
                self.slots[i] = _Slot()

    def step(self):
        """One scheduler tick: drain the queue into batched prefills, pump one decode
        chunk, retire finished slots."""
        deferred = []
        admissible = []  # raw items with capacity: (item, slot_or_None)
        free = [i for i in range(self.max_slots) if not self.active[i] and not self.slots[i].held]
        taken = set()
        debounced = False
        try:
            while True:
                try:
                    item = self.queue.get_nowait()
                except queue.Empty:
                    if admissible and not debounced and self.admission_debounce_s > 0:
                        debounced = True
                        self._phase_s["debounce_sleep"] += self.admission_debounce_s
                        time.sleep(self.admission_debounce_s)
                        continue
                    break
                self._in_admission.add(item.request_id)
                if isinstance(item, Continuation):
                    if item.parent_request_id in self.held:
                        admissible.append((item, None))
                    else:
                        deferred.append(item)  # parent not finished/held yet
                else:
                    slot_idx = next((i for i in free if i not in taken), None)
                    if slot_idx is None:
                        deferred.append(item)
                        break
                    taken.add(slot_idx)
                    admissible.append((item, slot_idx))
            if admissible and len(admissible) < self.admit_min_batch and self.active.any():
                # coalesce: let the decoding slots run on; these rows wait for company
                deferred.extend(item for item, _ in admissible)
                admissible = []
            for item in deferred:
                self.queue.put(item)
                self._in_admission.discard(item.request_id)
            if admissible:
                # per-item prep: a failing item (e.g. an over-bucket continuation
                # chunk) is errored alone, never poisoning its co-admitted peers
                rows, prepped = [], []
                for item, slot_idx in admissible:
                    try:
                        rows.append(
                            self._prep_continuation(item) if isinstance(item, Continuation)
                            else self._prep_request(item, slot_idx)
                        )
                        prepped.append((item, slot_idx))
                    except Exception as e:  # noqa: BLE001 — see _fail_admission
                        self._fail_admission([(item, slot_idx)], e)
                if rows:
                    try:
                        self._run_prefill_batch(rows)
                    except Exception as e:  # noqa: BLE001
                        # rows already committed before the failure (a patch-cap
                        # split runs groups sequentially — group 1 may have
                        # activated its slots and emitted first tokens) must NOT
                        # re-run: a retry would resample their first token and
                        # double-fire on_tokens/_finish
                        pending_rows = [(row, pi) for row, pi in zip(rows, prepped)
                                        if not row.done]
                        if len(pending_rows) == 1:
                            self._fail_admission([pending_rows[0][1]], e)
                        else:
                            # isolate the poison row(s): each row retries in its own
                            # single-row batch; only genuine offenders error out
                            for row, pi in pending_rows:
                                try:
                                    self._run_prefill_batch([row])
                                except Exception as e2:  # noqa: BLE001
                                    self._fail_admission([pi], e2)
                self._sweep_orphan_held()
        finally:
            # slots now reflect the admitted rows (or the tick failed) — either way
            # cancel_prefix no longer needs the admission shadow
            for item, _ in admissible:
                self._in_admission.discard(item.request_id)
        if not self.active.any():
            return False
        t_dec = time.time()
        live = [i for i in range(self.max_slots) if self.active[i]]
        bucket_R = next((b for b in self.decode_row_buckets if b >= len(live)), None)
        self._key, sub = jax.random.split(self._key)
        if bucket_R is not None:
            # row-compacted chunk: step only a gathered bucket of the live rows
            slot_idx = np.full((bucket_R,), self.max_slots, np.int32)
            slot_idx[: len(live)] = live
            act = np.zeros((bucket_R,), bool)
            act[: len(live)] = True
            temps = np.array(
                [self.slots[i].request.temperature if self.slots[i].request else 0.0
                 for i in live] + [0.0] * (bucket_R - len(live)), np.float32,
            )
            fn = self._get_decode_compact_fn(bucket_R, self._attend_for(live))
            self.cache, self.cur_tokens, self.next_pos, toks_c = fn(
                self.cache, jnp.asarray(slot_idx), self.cur_tokens, self.next_pos,
                jnp.asarray(act), jnp.asarray(temps), sub, self.params,
            )
            toks_np = np.asarray(toks_c)  # (bucket_R, n_steps)
            row_toks = {i: toks_np[j] for j, i in enumerate(live)}
            stepped_rows = bucket_R
        else:
            temps = np.array(
                [s.request.temperature if s.request else 0.0 for s in self.slots], np.float32
            )
            self.cache, self.cur_tokens, self.next_pos, toks = self._get_decode_fn(
                self._attend_for(live)
            )(
                self.cache, self.cur_tokens, self.next_pos,
                jnp.asarray(self.active), jnp.asarray(temps), sub, self.params,
            )
            toks_np = np.asarray(toks)
            row_toks = {i: toks_np[i] for i in live}
            stepped_rows = self.max_slots
        self._phase_s["decode_device"] += time.time() - t_dec
        self.stats["decode_steps"] += self.decode_chunk
        # decode-slot utilization: live rows vs device rows actually stepped (with
        # compaction the latter tracks the bucket, not max_slots)
        self.stats["decode_live_row_steps"] = (
            self.stats.get("decode_live_row_steps", 0) + len(live) * self.decode_chunk
        )
        self.stats["decode_device_row_steps"] = (
            self.stats.get("decode_device_row_steps", 0) + stepped_rows * self.decode_chunk
        )
        for slot_idx in live:
            slot = self.slots[slot_idx]
            rid = slot.request.request_id
            streamed: List[int] = []
            for t in row_toks[slot_idx]:
                t = int(t)
                slot.generated.append(t)
                slot.remaining -= 1
                if t in self._stop_tokens:
                    self._finish(slot_idx, "stop")
                    break
                streamed.append(t)  # after the stop check: mirror Completion.token_ids
                if slot.remaining <= 0:
                    self._finish(slot_idx, "length")
                    break
            if streamed and self.on_tokens is not None:
                self.on_tokens(rid, streamed)
        return True

    def get_completion(self, request_id: str, timeout: Optional[float] = None) -> Completion:
        deadline = time.time() + timeout if timeout else None
        with self._results_cond:
            while request_id not in self.results:
                remaining = (deadline - time.time()) if deadline else None
                if remaining is not None and remaining <= 0:
                    raise TimeoutError(request_id)
                self._results_cond.wait(timeout=remaining)
            return self.results.pop(request_id)

    def run_until_idle(self, max_ticks: int = 100000):
        for _ in range(max_ticks):
            busy = self.step()
            if not busy and self.queue.empty():
                return
        raise RuntimeError("engine did not drain")

    # -- background pump ----------------------------------------------------

    def start(self):
        self._running = True

        def pump():
            while self._running:
                try:
                    busy = self.step()
                except Exception:  # noqa: BLE001
                    # the pump IS the engine: if it dies, every get_completion
                    # blocks forever. Admission failures are contained upstream
                    # (_fail_admission); anything that still escapes is logged and
                    # the loop continues serving the remaining slots.
                    import sys
                    import traceback

                    traceback.print_exc(file=sys.stderr)
                    busy = False
                if not busy:
                    time.sleep(0.002)

        self._pump_thread = threading.Thread(target=pump, daemon=True)
        self._pump_thread.start()

    def stop(self):
        self._running = False
        if self._pump_thread:
            self._pump_thread.join(timeout=5)
            self._pump_thread = None
