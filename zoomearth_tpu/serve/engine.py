"""Continuous-batching serving engine: slot-based KV cache, chunked decode, per-request
sampling. The vLLM-equivalent (SURVEY.md §2.4: paged-attention engine + scheduler) built
TPU-first: a fixed pool of B cache slots, one jitted decode program stepping ALL active
slots together, and per-slot insert/evict so requests join and leave mid-flight without
recompilation or draining the batch.

Host-side scheduler (this file, pure Python — not on the hot path): admits queued
requests into free slots via bucketed single-request prefill, pumps K decode steps per
tick, retires finished slots. The device never waits on the host between the K steps.
"""

from __future__ import annotations

import dataclasses
import itertools
import queue
import threading
import time
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VLMConfig
from ..models.decoder import KVCache, decoder_forward, logits_from_hidden
from ..models.rope import mrope_position_ids
from ..models.vit import vision_metadata
from ..models.vlm import vlm_forward
from ..runtime.generate import DEFAULT_LENGTH_BUCKETS, DEFAULT_PATCH_BUCKETS, bucket


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
        patch_buckets: Sequence[int] = DEFAULT_PATCH_BUCKETS,
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len
        self.decode_chunk = decode_chunk
        self.length_buckets = tuple(b for b in length_buckets if b <= max_seq_len)
        self.patch_buckets = patch_buckets
        dtype = cache_dtype or jnp.dtype(cfg.dtype)
        self.cache = KVCache.create(cfg.text, max_slots, max_seq_len, dtype)
        self.cur_tokens = jnp.zeros((max_slots,), jnp.int32)
        self.next_pos = jnp.zeros((max_slots,), jnp.int32)  # M-RoPE position
        self.active = np.zeros((max_slots,), bool)
        self.slots: List[_Slot] = [_Slot() for _ in range(max_slots)]
        self.held: Dict[str, int] = {}  # request_id -> held slot index
        self.queue: "queue.Queue" = queue.Queue()  # Request | Continuation
        self.results: Dict[str, Completion] = {}
        self._results_cond = threading.Condition()
        self._key = jax.random.key(seed)
        self._stop_tokens = (cfg.tokens.eos, cfg.tokens.endoftext)
        self._prefill_fns: Dict[Tuple[int, int], Callable] = {}
        self._insert_fn = jax.jit(self._insert, donate_argnums=(0,))
        self._decode_fn = jax.jit(
            partial(self._decode_steps, n_steps=decode_chunk), donate_argnums=(0,)
        )
        self._pump_thread: Optional[threading.Thread] = None
        self._running = False
        self.stats = {"completed": 0, "decode_steps": 0, "prefills": 0}

    # ------------------------------------------------------------------
    # jitted device programs
    # ------------------------------------------------------------------

    def _prefill_one(self, params, ids, length, pos, pixel_values, meta, cache1):
        """Single-request prefill into a fresh 1-slot cache -> (last logits, cache)."""
        S = ids.shape[1]
        attn_positions = jnp.arange(S)[None]
        attn_valid = attn_positions < length[:, None]
        logits, cache1 = vlm_forward(
            params, self.cfg, ids, pos,
            pixel_values=pixel_values, vision_meta=meta,
            attn_positions=attn_positions, attn_valid=attn_valid,
            cache=cache1, update_cache_len=False, logit_index=length - 1,
            # XLA's fused attention beats the Pallas causal kernel at our prefill
            # sizes (measured on-TPU); flash_causal stays opt-in for long-context
            use_flash=False,
        )
        return logits, cache1._replace(length=length)

    def _insert(self, cache: KVCache, cache1: KVCache, slot, cur_tok, nxt_pos, cur_tokens, next_pos):
        """Copy a 1-slot prefill cache into slot `slot` of the pool."""
        T1 = cache1.k[0].shape[2]  # (1, Hkv, T, D) layout
        new_k = tuple(
            jax.lax.dynamic_update_slice(k, c1k.astype(k.dtype), (slot, 0, 0, 0))
            if T1 == k.shape[2]
            else jax.lax.dynamic_update_slice(
                k, jnp.pad(c1k.astype(k.dtype), ((0, 0), (0, 0), (0, k.shape[2] - T1), (0, 0))), (slot, 0, 0, 0)
            )
            for k, c1k in zip(cache.k, cache1.k)
        )
        new_v = tuple(
            jax.lax.dynamic_update_slice(v, c1v.astype(v.dtype), (slot, 0, 0, 0))
            if T1 == v.shape[2]
            else jax.lax.dynamic_update_slice(
                v, jnp.pad(c1v.astype(v.dtype), ((0, 0), (0, 0), (0, v.shape[2] - T1), (0, 0))), (slot, 0, 0, 0)
            )
            for v, c1v in zip(cache.v, cache1.v)
        )
        length = cache.length.at[slot].set(cache1.length[0])
        cur_tokens = cur_tokens.at[slot].set(cur_tok)
        next_pos = next_pos.at[slot].set(nxt_pos)
        return KVCache(new_k, new_v, length), cur_tokens, next_pos

    def _decode_steps(self, cache, cur_tokens, next_pos, active, temps, key, params, *, n_steps):
        """Run n_steps decode for all slots; inactive slots write garbage into their own
        cache region only. Returns (cache, cur_tokens, next_pos, tokens (B, n_steps))."""
        B = self.max_slots
        pad_id = self.cfg.tokens.pad

        def body(carry, _):
            cache, cur, pos, key = carry
            pos3 = jnp.broadcast_to(pos[None, :, None], (3, B, 1))
            logits, cache = vlm_forward(
                params, self.cfg, cur[:, None], pos3,
                attn_positions=cache.length[:, None], cache=cache,
            )
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

    def _slice_slot(self, cache: KVCache, slot):
        """Extract one slot's cache row as a 1-slot KVCache."""
        return KVCache(
            k=tuple(jax.lax.dynamic_slice_in_dim(k, slot, 1, axis=0) for k in cache.k),
            v=tuple(jax.lax.dynamic_slice_in_dim(v, slot, 1, axis=0) for v in cache.v),
            length=jax.lax.dynamic_slice_in_dim(cache.length, slot, 1, axis=0),
        )

    def _chunk_prefill_one(self, params, ids, chunk_len, keep_len, pos, pixel_values, meta, cache1):
        """Prefill a continuation chunk into a 1-slot cache truncated at keep_len."""
        S = ids.shape[1]
        attn_positions = keep_len[:, None] + jnp.arange(S)[None]
        attn_valid = jnp.arange(S)[None] < chunk_len[:, None]
        cache1 = cache1._replace(length=keep_len)
        logits, cache1 = vlm_forward(
            params, self.cfg, ids, pos,
            pixel_values=pixel_values, vision_meta=meta,
            attn_positions=attn_positions, attn_valid=attn_valid,
            cache=cache1, update_cache_len=False, logit_index=chunk_len - 1,
        )
        return logits, cache1._replace(length=keep_len + chunk_len)

    # ------------------------------------------------------------------
    # host-side scheduler
    # ------------------------------------------------------------------

    def submit_continuation(self, continuation: Continuation):
        """Queue a continuation of a hold_slot request (the stage-2 zoom pattern)."""
        self.queue.put(continuation)

    def release_slot(self, request_id: str):
        """Free a held slot without continuing it."""
        slot_idx = self.held.pop(request_id, None)
        if slot_idx is not None:
            self.slots[slot_idx] = _Slot()

    def _admit_continuation(self, c: Continuation):
        cfg = self.cfg
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

        from ..models.rope import mrope_chunk_position_ids

        S = bucket(len(chunk_ids), self.length_buckets)
        padded = np.full((1, S), cfg.tokens.pad, np.int32)
        padded[0, : len(chunk_ids)] = chunk_ids
        grids = [g for _, g in c.images]
        pos = np.ones((3, 1, S), np.int32)
        p, nxt = mrope_chunk_position_ids(
            np.asarray(chunk_ids), grids, start_pos,
            image_pad_id=cfg.tokens.image_pad, merge_size=cfg.vision.spatial_merge_size,
        )
        pos[:, 0, : len(chunk_ids)] = p
        pv = meta_dev = None
        n_patches = 0
        if c.images:
            pv = np.concatenate([x for x, _ in c.images], axis=0)
            n_patches = bucket(pv.shape[0], self.patch_buckets)
            meta = vision_metadata(grids, cfg.vision, pad_to=n_patches)
            if n_patches > pv.shape[0]:
                pv = np.concatenate([pv, np.zeros((n_patches - pv.shape[0], pv.shape[1]), pv.dtype)])
            meta_dev = {
                "perm": jnp.asarray(meta.perm),
                "inv_perm_merged": jnp.asarray(meta.inv_perm_merged),
                "seg_window": jnp.asarray(meta.seg_window),
                "seg_full": jnp.asarray(meta.seg_full),
                "pos_ids": jnp.asarray(meta.pos_ids),
            }
            pv = jnp.asarray(pv)
        key = ("cont", S, n_patches)
        if key not in self._prefill_fns:
            self._prefill_fns[key] = jax.jit(self._chunk_prefill_one)
        if "slice" not in self._prefill_fns:
            self._prefill_fns["slice"] = jax.jit(self._slice_slot)
        cache1 = self._prefill_fns["slice"](self.cache, slot_idx)
        logits, cache1 = self._prefill_fns[key](
            self.params, jnp.asarray(padded), jnp.asarray([len(chunk_ids)], jnp.int32),
            jnp.asarray([keep_len], jnp.int32), jnp.asarray(pos), pv, meta_dev, cache1,
        )
        self.stats["prefills"] += 1
        if c.temperature <= 0.0:
            tok = int(np.argmax(np.asarray(logits[0])))
        else:
            self._key, sub = jax.random.split(self._key)
            tok = int(jax.random.categorical(sub, logits[0] / max(c.temperature, 1e-4)))
        self.cache, self.cur_tokens, self.next_pos = self._insert_fn(
            self.cache, cache1, slot_idx, tok, int(nxt), self.cur_tokens, self.next_pos
        )
        req = Request(
            request_id=c.request_id, token_ids=chunk_ids, images=c.images,
            max_tokens=c.max_tokens, temperature=c.temperature, hold_slot=c.hold_slot,
        )
        slot.request = req
        slot.generated = [tok]
        slot.remaining = c.max_tokens - 1
        slot.held = False
        slot.prompt_len = keep_len + len(chunk_ids)
        slot.prompt_next_pos = int(nxt)
        self.active[slot_idx] = True
        if tok in self._stop_tokens or slot.remaining <= 0:
            self._finish(slot_idx, "stop" if tok in self._stop_tokens else "length")

    def submit(self, request: Request):
        if len(request.token_ids) + request.max_tokens > self.max_seq_len:
            raise ValueError(
                f"request {request.request_id}: prompt ({len(request.token_ids)}) + "
                f"max_tokens ({request.max_tokens}) exceeds max_seq_len ({self.max_seq_len})"
            )
        self.queue.put(request)

    def _admit(self, req: Request, slot_idx: int):
        cfg = self.cfg
        ids = np.asarray(req.token_ids, np.int32)
        S = bucket(len(ids), self.length_buckets)
        padded = np.full((1, S), cfg.tokens.pad, np.int32)
        padded[0, : len(ids)] = ids
        grids = [g for _, g in req.images]
        pos, nxt = mrope_position_ids(
            padded[0], grids, image_pad_id=cfg.tokens.image_pad,
            merge_size=cfg.vision.spatial_merge_size,
            attention_mask=(padded[0] != cfg.tokens.pad).astype(np.int32),
        )
        pv = meta_dev = None
        n_patches = 0
        if req.images:
            pv = np.concatenate([p for p, _ in req.images], axis=0)
            n_patches = bucket(pv.shape[0], self.patch_buckets)
            meta = vision_metadata(grids, cfg.vision, pad_to=n_patches)
            if n_patches > pv.shape[0]:
                pv = np.concatenate([pv, np.zeros((n_patches - pv.shape[0], pv.shape[1]), pv.dtype)])
            meta_dev = {
                "perm": jnp.asarray(meta.perm),
                "inv_perm_merged": jnp.asarray(meta.inv_perm_merged),
                "seg_window": jnp.asarray(meta.seg_window),
                "seg_full": jnp.asarray(meta.seg_full),
                "pos_ids": jnp.asarray(meta.pos_ids),
            }
            pv = jnp.asarray(pv)

        pf_key = (S, n_patches)
        if pf_key not in self._prefill_fns:
            self._prefill_fns[pf_key] = jax.jit(self._prefill_one)
        cache1 = KVCache.create(cfg.text, 1, S, self.cache.k[0].dtype)
        logits, cache1 = self._prefill_fns[pf_key](
            self.params, jnp.asarray(padded), jnp.asarray([len(ids)], jnp.int32),
            jnp.asarray(pos[:, None, :]), pv, meta_dev, cache1,
        )
        self.stats["prefills"] += 1
        # first token: sampled host-side from the prefill logits
        if req.temperature <= 0.0:
            tok = int(np.argmax(np.asarray(logits[0])))
        else:
            self._key, sub = jax.random.split(self._key)
            tok = int(jax.random.categorical(sub, logits[0] / max(req.temperature, 1e-4)))
        self.cache, self.cur_tokens, self.next_pos = self._insert_fn(
            self.cache, cache1, slot_idx, tok, nxt, self.cur_tokens, self.next_pos
        )
        slot = self.slots[slot_idx]
        slot.request = req
        slot.generated = [tok]
        slot.remaining = req.max_tokens - 1
        slot.held = False
        slot.prompt_len = len(ids)
        slot.prompt_next_pos = int(nxt)
        self.active[slot_idx] = True
        if tok in self._stop_tokens or slot.remaining <= 0:
            self._finish(slot_idx, "stop" if tok in self._stop_tokens else "length")

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
        self.stats["completed"] += 1
        self.active[slot_idx] = False
        if req.hold_slot:
            slot.held = True
            self.held[req.request_id] = slot_idx
        else:
            self.slots[slot_idx] = _Slot()

    def step(self):
        """One scheduler tick: admit from queue, pump one decode chunk, retire."""
        deferred = []
        while True:
            free = [i for i in range(self.max_slots)
                    if not self.active[i] and not self.slots[i].held]
            try:
                item = self.queue.get_nowait()
            except queue.Empty:
                break
            if isinstance(item, Continuation):
                if item.parent_request_id in self.held:
                    self._admit_continuation(item)
                else:
                    deferred.append(item)  # parent not finished/held yet
            elif free:
                self._admit(item, free[0])
            else:
                deferred.append(item)
                break
        for item in deferred:
            self.queue.put(item)
        if not self.active.any():
            return False
        temps = np.array(
            [s.request.temperature if s.request else 0.0 for s in self.slots], np.float32
        )
        self._key, sub = jax.random.split(self._key)
        self.cache, self.cur_tokens, self.next_pos, toks = self._decode_fn(
            self.cache, self.cur_tokens, self.next_pos,
            jnp.asarray(self.active), jnp.asarray(temps), sub, self.params,
        )
        toks = np.asarray(toks)
        self.stats["decode_steps"] += self.decode_chunk
        for slot_idx in range(self.max_slots):
            if not self.active[slot_idx]:
                continue
            slot = self.slots[slot_idx]
            for t in toks[slot_idx]:
                t = int(t)
                slot.generated.append(t)
                slot.remaining -= 1
                if t in self._stop_tokens:
                    self._finish(slot_idx, "stop")
                    break
                if slot.remaining <= 0:
                    self._finish(slot_idx, "length")
                    break
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
                busy = self.step()
                if not busy:
                    time.sleep(0.002)

        self._pump_thread = threading.Thread(target=pump, daemon=True)
        self._pump_thread.start()

    def stop(self):
        self._running = False
        if self._pump_thread:
            self._pump_thread.join(timeout=5)
            self._pump_thread = None
