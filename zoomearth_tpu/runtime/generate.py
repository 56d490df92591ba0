"""Jitted generation runtime: bucketed prefill + while-loop decode with KV cache.

TPU-native replacement for the reference's HF `generate` calls (demo.py:14,
infer.py:101-124, grpo_trainer.py:561-565): the whole decode loop runs on device under
one jit — token-by-token Python dispatch, host sampling, and host stop-checks are gone.

Shape policy (the TPU-specific hard part, SURVEY.md §7.3 item 1):
- prompts are right-padded to a length bucket; image patch counts are padded to a patch
  bucket (pad patches carry segment id -1);
- one compiled program per (batch, prompt_bucket, patch_bucket, max_new) tuple, cached;
- decode is a lax.while_loop with early exit when every row has emitted a stop token.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VLMConfig
from ..models.decoder import KVCache
from ..models.rope import mrope_position_ids_batch
from ..models.vit import vision_metadata
from ..models.vlm import vlm_forward
from ..ops.sampling import greedy, sample

DEFAULT_LENGTH_BUCKETS = (128, 256, 384, 512, 768, 1024, 1536, 2048)
# KV-cache allocation buckets (multiples of 256 — the flash kernels' kv block).
# Decode attention reads the FULL allocation every step (masked by kv_len), so a
# right-sized cache cuts decode HBM traffic: stage 1 of the zoom-QA episode needs
# ~1024 rows while the episode's final length needs 1536 — allocating 1536 up front
# made every stage-1 decode step read 1.5x the cache bytes it used (measured r4).
DEFAULT_CACHE_BUCKETS = (256, 512, 768, 1024, 1280, 1536, 2048, 3072, 4096)
DEFAULT_PATCH_BUCKETS = (0, 256, 512, 1024, 1600, 2304, 3136, 4096, 6400, 8192, 10368, 12800, 16384, 20736, 24576, 32768, 41472, 49152, 65536, 82944, 98304, 131072)


def bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"{n} exceeds largest bucket {buckets[-1]}")


@dataclasses.dataclass
class GenerationConfig:
    max_new_tokens: int = 1024
    temperature: float = 0.0  # 0 = greedy (reference demo); eval uses 0.01+sample
    top_p: float = 1.0
    # stop tokens default to (eos, endoftext) from the model config


@dataclasses.dataclass
class PreparedBatch:
    """Host-prepared, bucket-padded model inputs for one generation call."""

    input_ids: np.ndarray  # (B, S) right-padded
    lengths: np.ndarray  # (B,)
    position_ids: np.ndarray  # (3, B, S)
    next_pos: np.ndarray  # (B,) first decode M-RoPE position
    pixel_values: Optional[np.ndarray]  # (P, D) padded to patch bucket
    vision_meta: Optional[dict]


def prepare_batch(
    cfg: VLMConfig,
    token_lists: Sequence[Sequence[int]],
    images_per_seq: Sequence[Sequence[Tuple[np.ndarray, Tuple[int, int, int]]]],
    *,
    length_buckets: Sequence[int] = DEFAULT_LENGTH_BUCKETS,
    patch_buckets: Sequence[int] = DEFAULT_PATCH_BUCKETS,
) -> PreparedBatch:
    """Pack prompts + preprocessed images into bucket-padded arrays.

    images_per_seq[b] is a list of (pixel_values, grid_thw) per image of sequence b, in
    order of appearance. Pads input ids with cfg.tokens.pad on the right.
    """
    B = len(token_lists)
    lengths = np.asarray([len(t) for t in token_lists], dtype=np.int32)
    S = bucket(int(lengths.max()), length_buckets)
    ids = np.full((B, S), cfg.tokens.pad, dtype=np.int32)
    for b, toks in enumerate(token_lists):
        ids[b, : len(toks)] = toks

    grids_per_seq = [[g for _, g in imgs] for imgs in images_per_seq]
    pos, next_pos = mrope_position_ids_batch(
        ids,
        grids_per_seq,
        image_pad_id=cfg.tokens.image_pad,
        merge_size=cfg.vision.spatial_merge_size,
        attention_mask=(ids != cfg.tokens.pad).astype(np.int32)
        if any(len(t) != S for t in token_lists)
        else None,
    )
    # next_pos from mrope: position of first token AFTER the valid prompt.

    all_pv = [pv for imgs in images_per_seq for pv, _ in imgs]
    all_grids = [g for gs in grids_per_seq for g in gs]
    pixel_values = None
    meta_dev = None
    if all_pv:
        pv = np.concatenate(all_pv, axis=0)
        P = bucket(pv.shape[0], patch_buckets)
        meta = vision_metadata(all_grids, cfg.vision, pad_to=P)
        if P > pv.shape[0]:
            pv = np.concatenate([pv, np.zeros((P - pv.shape[0], pv.shape[1]), pv.dtype)])
        pixel_values = pv
        meta_dev = _meta_dict(meta)
    return PreparedBatch(ids, lengths, pos, next_pos, pixel_values, meta_dev)


def _meta_dict(meta) -> dict:
    """VisionMetadata -> host meta dict for PreparedBatch (numpy arrays; uploaded by
    the Generator). win_mode is a plain STATIC int — consumers pop it before jit."""
    d = {
        "perm": meta.perm,
        "inv_perm_merged": meta.inv_perm_merged,
        "seg_window": meta.seg_window,
        "seg_full": meta.seg_full,
        "pos_ids": meta.pos_ids,
        "win_mode": meta.win_mode,
    }
    if meta.win_gidx is not None:
        d["win_gidx"] = meta.win_gidx
        d["win_valid"] = meta.win_valid
        d["win_sidx"] = meta.win_sidx
    return d


def prepare_continuation(
    cfg: VLMConfig,
    chunk_token_lists: Sequence[Sequence[int]],
    images_per_seq: Sequence[Sequence[Tuple[np.ndarray, Tuple[int, int, int]]]],
    start_positions: Sequence[int],
    *,
    length_buckets: Sequence[int] = DEFAULT_LENGTH_BUCKETS,
    patch_buckets: Sequence[int] = DEFAULT_PATCH_BUCKETS,
) -> PreparedBatch:
    """Pack CONTINUATION chunks (e.g. stage-2 vision tokens) for cache-reuse prefill.

    start_positions[b] is the M-RoPE position where row b's chunk begins (the kept
    prefix's next position). Unlike prepare_batch, position ids are per-row offset."""
    from ..models.rope import mrope_chunk_position_ids

    B = len(chunk_token_lists)
    lengths = np.asarray([len(t) for t in chunk_token_lists], dtype=np.int32)
    S = bucket(int(lengths.max()), length_buckets)
    ids = np.full((B, S), cfg.tokens.pad, dtype=np.int32)
    pos = np.ones((3, B, S), dtype=np.int32)
    next_pos = np.zeros((B,), np.int32)
    for b, toks in enumerate(chunk_token_lists):
        ids[b, : len(toks)] = toks
        grids = [g for _, g in images_per_seq[b]]
        p, nxt = mrope_chunk_position_ids(
            np.asarray(toks), grids, int(start_positions[b]),
            image_pad_id=cfg.tokens.image_pad, merge_size=cfg.vision.spatial_merge_size,
        )
        pos[:, b, : len(toks)] = p
        next_pos[b] = nxt

    all_pv = [pv for imgs in images_per_seq for pv, _ in imgs]
    all_grids = [g for imgs in images_per_seq for _, g in imgs]
    pixel_values = None
    meta_dev = None
    if all_pv:
        pv = np.concatenate(all_pv, axis=0)
        P = bucket(pv.shape[0], patch_buckets)
        meta = vision_metadata(all_grids, cfg.vision, pad_to=P)
        if P > pv.shape[0]:
            pv = np.concatenate([pv, np.zeros((P - pv.shape[0], pv.shape[1]), pv.dtype)])
        pixel_values = pv
        meta_dev = _meta_dict(meta)
    return PreparedBatch(ids, lengths, pos, next_pos, pixel_values, meta_dev)


class Generator:
    """Compile-cached generation engine over a fixed param tree layout."""

    def __init__(self, params, cfg: VLMConfig, max_cache_len: int = 4096, cache_dtype=None,
                 right_size_cache: bool = False, prefill_split_rows: int = 0):
        self.params = params
        self.cfg = cfg
        self.max_cache_len = max_cache_len
        self.cache_dtype = cache_dtype or jnp.dtype(cfg.dtype)
        # right_size_cache: allocate each generate() call's cache to its own bucketed
        # need instead of max_cache_len; continue_generate grows it on device. Cuts
        # stage-1 decode cache reads ~1/3, but the growth transition holds old+new
        # trees simultaneously (donation can't alias across shapes and measured as NOT
        # freeing early), which raised PEAK memory and OOM'd the B=48 pipelined wave
        # bench on v5e — so this is opt-in for capacity-limited non-pipelined use.
        self.right_size_cache = right_size_cache
        # prefill_split_rows: run generate()'s prefill in row slices of this size when
        # B exceeds it (precomputed-embeds batches only). Bounds the prefill's
        # activation transients — see _prefill_rows — enabling batch >= 96 on v5e.
        self.prefill_split_rows = prefill_split_rows
        self._prefill_fns = {}
        self._decode_fns = {}

    def new_cache(self, batch: int) -> KVCache:
        """Fresh full-size cache in this generator's layout (e.g. an inert pair-decode
        partner, or external prefill orchestration)."""
        return KVCache.create(self.cfg.text, batch, self.max_cache_len, self.cache_dtype)

    @staticmethod
    def _attend_bucket(need: int, alloc: int):
        """Smallest cache bucket covering `need` rows, or None for a full-allocation
        read. Decode attention reads the whole (masked) span it is compiled for, so a
        stage whose prompt+new extent fits a smaller bucket passes that bucket as the
        STATIC attend_len and reads only that prefix of the full-size buffer.

        With the opt-in Pallas decode kernels enabled the span is rounded up to the
        kernels' 512-token kv chunk — 768/1280 buckets would otherwise silently fall
        back to XLA decode attention (decoder._attn_layer requires T % 512 == 0)."""
        import os

        flash = (os.environ.get("ZOOMEARTH_FLASH_DECODE") == "1"
                 or os.environ.get("ZOOMEARTH_FLASH_DECODE_Q8") == "1")
        for b in DEFAULT_CACHE_BUCKETS:
            if flash and b % 512:
                continue
            if need <= b < alloc:
                return b
        return None

    def _prefill(self, params, ids, lengths, pos, pixel_values, meta, cache, *, use_flash=False, win_mode=0):
        """Prefill the cache; returns (last-token logits (B, V), cache).

        pixel_values with meta=None means PRECOMPUTED vision embeddings (N_tokens, E)
        — the embeds-input family path (InternVL: reference is_embeds_input,
        vlm_modules/internvl_module.py:47-48)."""
        B, S = ids.shape
        attn_positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
        attn_valid = attn_positions < lengths[:, None]
        vis_kw = (
            dict(vision_embeds=pixel_values)
            if pixel_values is not None and meta is None
            else dict(pixel_values=pixel_values, vision_meta=meta)
        )
        last, cache = vlm_forward(
            params,
            self.cfg,
            ids,
            pos,
            attn_positions=attn_positions,
            attn_valid=attn_valid,
            cache=cache,
            update_cache_len=False,
            logit_index=lengths - 1,
            use_flash=use_flash,
            win_mode=win_mode,
            **vis_kw,
        )
        cache = cache._replace(length=lengths)
        return last, cache

    def _prefill_rows(self, params, ids, lengths, pos, vision_embeds, cache_full, row_off, *, use_flash=False):
        """Prefill a ROW SLICE [row_off, row_off+R) of a full-batch cache (embeds path
        only). Runs the decoder on R rows into a temp cache, then writes it into the
        donated full cache at the row offset. Splitting the prefill bounds activation
        transients — the fused gate|up output alone is B·S·2F bf16 (3.2 GB at
        B=96/S=768), which stacked on weights + the full cache OOMs v5e (probe_mem96);
        two half-batch passes reuse one compiled program and halve that peak."""
        R, S = ids.shape
        attn_positions = jnp.broadcast_to(jnp.arange(S)[None], (R, S))
        attn_valid = attn_positions < lengths[:, None]
        # tmp cache sized to the PREFILL extent (S), not the full allocation: the
        # prefill writes only slots < S, and a full-T tmp tree adds R*(T-S) rows of
        # dead HBM to the program peak (2.7 GB at R=48/T=1536 — the probe_mem96
        # margin at B=96)
        tmp = KVCache.create(self.cfg.text, R, S, self.cache_dtype)
        last, tmp = vlm_forward(
            params, self.cfg, ids, pos,
            attn_positions=attn_positions, attn_valid=attn_valid,
            cache=tmp, update_cache_len=False, logit_index=lengths - 1,
            use_flash=use_flash, vision_embeds=vision_embeds,
        )
        z = jnp.zeros((), jnp.int32)

        def put4(full, part):
            return jax.lax.dynamic_update_slice(full, part, (row_off, z, z, z))

        def put3(full, part):
            return jax.lax.dynamic_update_slice(full, part, (row_off, z, z))

        cache_full = cache_full._replace(
            k=tuple(put4(f, p) for f, p in zip(cache_full.k, tmp.k)),
            v=tuple(put4(f, p) for f, p in zip(cache_full.v, tmp.v)),
            kscale=tuple(put3(f, p) for f, p in zip(cache_full.kscale, tmp.kscale))
            if cache_full.kscale is not None else None,
            vscale=tuple(put3(f, p) for f, p in zip(cache_full.vscale, tmp.vscale))
            if cache_full.vscale is not None else None,
            length=jax.lax.dynamic_update_slice(cache_full.length, lengths, (row_off,)),
        )
        return last, cache_full

    def _decode_loop(self, params, first_logits, cache, next_pos, key, done0=None, *, max_new, temperature, top_p, stop_tokens, attend_len=None):
        """While-loop decode. Returns tokens (B, max_new) padded with pad id after stop.

        done0: optional (B,) bool — rows starting as done decode nothing (their slots
        stay idle and the loop exits as soon as the live rows finish); used for inert
        rows in batched continuations (e.g. GRPO rollouts without a stage-2 crop).

        attend_len (STATIC): decode attention reads only cache[:, :, :attend_len] — a
        bucket covering this stage's prompt + max_new extent. The cache buffer itself
        stays full-size (max_cache_len), so the stage-2 continuation needs no growth
        copy; only the hot loop's read span shrinks (see decoder._attn_layer)."""
        B = first_logits.shape[0]
        pad_id = self.cfg.tokens.pad
        stop = jnp.asarray(stop_tokens, jnp.int32)

        def pick(logits, k):
            if temperature <= 0.0:
                return greedy(logits)
            return sample(logits, k, temperature, top_p)

        def cond(state):
            step, done, *_ = state
            return (step < max_new) & ~jnp.all(done)

        def body(state):
            step, done, tokens_buf, cur_logits, cache, pos, key = state
            key, sub = jax.random.split(key)
            tok = pick(cur_logits, sub)
            tok = jnp.where(done, pad_id, tok)
            tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, tok[:, None], (0, step))
            newly_done = jnp.isin(tok, stop)
            done_next = done | newly_done
            # forward the new token (even for done rows — masked out of the buffer)
            pos3 = jnp.broadcast_to(pos[None, :, None], (3, B, 1))
            logits, cache = vlm_forward(
                params,
                self.cfg,
                tok[:, None],
                pos3,
                attn_positions=cache.length[:, None],
                cache=cache,
                attend_len=attend_len,
            )
            return step + 1, done_next, tokens_buf, logits[:, 0], cache, pos + 1, key

        tokens_buf = jnp.full((B, max_new), pad_id, jnp.int32)
        if done0 is None:
            done0 = jnp.zeros((B,), jnp.bool_)
        state = (0, done0, tokens_buf, first_logits, cache, next_pos, key)
        _, _, tokens_buf, _, cache, _, _ = jax.lax.while_loop(cond, body, state)
        return tokens_buf, cache

    def _decode_loop_pair(self, params, logits_a, cache_a, pos_a, logits_b, cache_b, pos_b, key, done0_a=None, done0_b=None, *, steps, temperature, top_p, stop_tokens, attend_a, attend_b, temperature_b=None, top_p_b=None):
        """Co-batched while-loop decode over TWO independent caches (see
        decoder_forward_pair): one dense pass per step serves rows of both groups, so
        the per-step weight stream (~3 GB at 3B int8) is read once instead of twice.
        The pipelined wave runner pairs wave n's stage-1 decode with wave n-1's
        stage-2 decode for the first min(steps) tokens.

        temperature_b/top_p_b: group b's sampling params (default: same as group a) —
        the two stages of the zoom-QA episode may run different budgets AND different
        sampling configs (reference stage-2 chat, customized_funcs.py:206-225).

        Returns (buf_a, done_a, next_logits_a, cache_a, buf_b, done_b, next_logits_b,
        cache_b): EITHER group can resume in the standard solo loop (_decode_loop with
        first_logits = next_logits_*, done0 = done_*) for its remaining tokens."""
        from ..models.decoder import decoder_forward_pair
        from ..models.vlm import embed_tokens
        from ..models.decoder import logits_from_hidden

        Ba = logits_a.shape[0]
        Bb = logits_b.shape[0]
        B = Ba + Bb
        pad_id = self.cfg.tokens.pad
        stop = jnp.asarray(stop_tokens, jnp.int32)
        temp_b = temperature if temperature_b is None else temperature_b
        tp_b = top_p if top_p_b is None else top_p_b

        def pick_group(logits, k, temp, tp):
            if temp <= 0.0:
                return greedy(logits)
            return sample(logits, k, temp, tp)

        def pick(logits, k):
            ka, kb = jax.random.split(k)
            return jnp.concatenate([
                pick_group(logits[:Ba], ka, temperature, top_p),
                pick_group(logits[Ba:], kb, temp_b, tp_b),
            ])

        def cond(state):
            step, done_a, done_b, *_ = state
            return (step < steps) & ~(jnp.all(done_a) & jnp.all(done_b))

        def body(state):
            (step, done_a, done_b, buf_a, buf_b, cur_logits,
             cache_a, cache_b, pos_a, pos_b, key) = state
            key, sub = jax.random.split(key)
            tok = pick(cur_logits, sub)
            done = jnp.concatenate([done_a, done_b])
            tok = jnp.where(done, pad_id, tok)
            buf_a = jax.lax.dynamic_update_slice(buf_a, tok[:Ba, None], (0, step))
            buf_b = jax.lax.dynamic_update_slice(buf_b, tok[Ba:, None], (0, step))
            newly = jnp.isin(tok, stop)
            done_a = done_a | newly[:Ba]
            done_b = done_b | newly[Ba:]
            x = embed_tokens(params, tok[:, None])
            pos = jnp.concatenate([pos_a, pos_b])
            pos3 = jnp.broadcast_to(pos[None, :, None], (3, B, 1))
            hidden, cache_a, cache_b = decoder_forward_pair(
                params["text"], self.cfg.text, x, pos3, cache_a, cache_b,
                attend_a, attend_b,
            )
            logits = logits_from_hidden(params["text"], self.cfg.text, hidden)[:, 0]
            return (step + 1, done_a, done_b, buf_a, buf_b, logits,
                    cache_a, cache_b, pos_a + 1, pos_b + 1, key)

        buf_a = jnp.full((Ba, steps), pad_id, jnp.int32)
        buf_b = jnp.full((Bb, steps), pad_id, jnp.int32)
        if done0_a is None:
            done0_a = jnp.zeros((Ba,), jnp.bool_)
        if done0_b is None:
            done0_b = jnp.zeros((Bb,), jnp.bool_)
        state = (0, done0_a, done0_b, buf_a, buf_b,
                 jnp.concatenate([logits_a, logits_b]),
                 cache_a, cache_b, pos_a, pos_b, key)
        (_, done_a, done_b, buf_a, buf_b, logits, cache_a, cache_b, *_) = jax.lax.while_loop(
            cond, body, state
        )
        return buf_a, done_a, logits[:Ba], cache_a, buf_b, done_b, logits[Ba:], cache_b

    def _chunk_prefill(self, params, ids, chunk_lens, keep_len, pos, pixel_values, meta, cache, *, use_flash=False, grow_to=None, win_mode=0):
        """Prefill a continuation chunk into an EXISTING cache truncated to keep_len.

        grow_to: target cache rows — a stage-1 cache is right-sized (see generate());
        the continuation zero-extends it ON DEVICE inside this program (an HBM copy at
        streaming speed, ~7 ms at 3B/B=48 — vs allocating the final size up front,
        which makes every stage-1 decode step read the unused tail)."""
        if grow_to is not None and cache.k[0].shape[2] < grow_to:
            ext = grow_to - cache.k[0].shape[2]

            def g4(a):
                return jnp.pad(a, ((0, 0), (0, 0), (0, ext), (0, 0)))

            def g3(a):
                return jnp.pad(a, ((0, 0), (0, 0), (0, ext)))

            cache = cache._replace(
                k=tuple(g4(a) for a in cache.k),
                v=tuple(g4(a) for a in cache.v),
                kscale=tuple(g3(a) for a in cache.kscale) if cache.kscale is not None else None,
                vscale=tuple(g3(a) for a in cache.vscale) if cache.vscale is not None else None,
            )
        B, S = ids.shape
        T = cache.k[0].shape[2]
        attn_positions = keep_len[:, None] + jnp.arange(S)[None]
        attn_valid = jnp.arange(S)[None] < chunk_lens[:, None]
        # pad tokens write to slot T -> dropped (a dynamic_update_slice would CLAMP a
        # keep_len + S > T window back onto valid kv)
        write_pos = jnp.where(attn_valid, attn_positions, T)
        cache = cache._replace(length=keep_len)
        vis_kw = (
            dict(vision_embeds=pixel_values)
            if pixel_values is not None and meta is None
            else dict(pixel_values=pixel_values, vision_meta=meta)
        )
        logits, cache = vlm_forward(
            params, self.cfg, ids, pos,
            attn_positions=attn_positions, attn_valid=attn_valid,
            cache=cache, update_cache_len=False, logit_index=chunk_lens - 1,
            write_pos=write_pos, **vis_kw,
            use_flash=use_flash, win_mode=win_mode,
        )
        return logits, cache._replace(length=keep_len + chunk_lens)

    # -- composable stages (prefill / chunk-prefill / decode / pair-decode) --
    # generate()/continue_generate() are built from these; drivers that co-batch
    # decodes across stages (run_decode_pair) call them directly.

    def run_prefill(self, batch: PreparedBatch, *, max_new: int = 0):
        """Stage-1 prefill into a fresh cache. Returns (first_logits, cache, attend)
        — attend is the STATIC decode read span for this stage (run_decode's
        attend=). max_new sizes the attend bucket (and, when right_size_cache, the
        allocation)."""
        cfg = self.cfg
        B, S = batch.input_ids.shape
        # Optionally right-size the cache ALLOCATION to this stage's need (bucketed);
        # the default full-size allocation right-sizes only the decode READS via
        # attend_len (no growth copy at the stage-2 transition). See __init__.
        T1 = self.max_cache_len
        if self.right_size_cache:
            for b in DEFAULT_CACHE_BUCKETS:
                if S + max_new <= b <= self.max_cache_len:
                    T1 = b
                    break
        cache = KVCache.create(cfg.text, B, T1, self.cache_dtype)

        n_patches = batch.pixel_values.shape[0] if batch.pixel_values is not None else 0
        big = B * S * self.max_cache_len > 16 * 768 * 1536
        win_mode = int(batch.vision_meta.get("win_mode", 0)) if batch.vision_meta else 0
        pf_key = (B, S, n_patches, T1, win_mode)
        if pf_key not in self._prefill_fns:
            self._prefill_fns[pf_key] = jax.jit(
                functools.partial(self._prefill, use_flash=big, win_mode=win_mode),
                # donate the fresh zero cache: un-donated, the program holds the
                # zeros input AND the filled output simultaneously (+1 cache of HBM)
                donate_argnums=(6,),
            )
        prefill = self._prefill_fns[pf_key]

        meta = None
        if batch.vision_meta is not None:
            meta = {k: jnp.asarray(v) for k, v in batch.vision_meta.items() if k != "win_mode"}
        pv = jnp.asarray(batch.pixel_values) if batch.pixel_values is not None else None
        R = self.prefill_split_rows
        if R and B > R and B % R == 0 and meta is None and pv is not None:
            # split-row prefill (embeds path): R-row slices into the donated full cache
            rkey = ("rowpf", R, S, T1)
            if rkey not in self._prefill_fns:
                big_r = R * S * self.max_cache_len > 16 * 768 * 1536
                self._prefill_fns[rkey] = jax.jit(
                    functools.partial(self._prefill_rows, use_flash=big_r),
                    donate_argnums=(5,),
                )
            rowpf = self._prefill_fns[rkey]
            ids_np = np.asarray(batch.input_ids)
            n_img = (ids_np == cfg.tokens.image_pad).sum(axis=1)
            offs = np.concatenate([[0], np.cumsum(n_img)])
            ids_d = jnp.asarray(batch.input_ids)
            lens_d = jnp.asarray(batch.lengths)
            pos_d = jnp.asarray(batch.position_ids)
            parts = []
            for h in range(B // R):
                sl = slice(h * R, (h + 1) * R)
                lg, cache = rowpf(
                    self.params, ids_d[sl], lens_d[sl], pos_d[:, sl],
                    pv[int(offs[h * R]) : int(offs[(h + 1) * R])],
                    cache, jnp.int32(h * R),
                )
                parts.append(lg)
            first_logits = jnp.concatenate(parts, axis=0)
        else:
            first_logits, cache = prefill(
                self.params, jnp.asarray(batch.input_ids), jnp.asarray(batch.lengths),
                jnp.asarray(batch.position_ids), pv, meta, cache,
            )
        return first_logits, cache, self._attend_bucket(S + max_new, T1)

    def run_chunk_prefill(self, cache, batch: PreparedBatch, keep_len, *, max_new: int,
                          grow_to: Optional[int] = None):
        """Prefill a continuation chunk into an existing cache (see continue_generate
        for semantics). Returns (first_logits, cache, attend) where attend is the
        STATIC decode read span for the stage's final extent (run_decode's attend=).

        grow_to: override the grown cache size (default: bucket of the stage's own
        need). A driver seeding a stage from a SHARED prefix-KV holder (e.g. the
        per-image [system+image] span reused across questions) grows straight to the
        episode's final size so later stages need no further growth; the holder is
        never donated (shape change) and survives for the next wave."""
        cfg = self.cfg
        B, S = batch.input_ids.shape
        n_patches = batch.pixel_values.shape[0] if batch.pixel_values is not None else 0
        # Chunk-prefill attention path: at the wave shape (B=64/S=384/T=1536) the
        # Pallas causal kernel beats XLA's masked attention 4.8 vs 8.2 ms/layer-call
        # (probe_chunk_prefill, r4) — use flash for big shapes. Small shapes (engine
        # trickle admissions) keep XLA (measured winner there). int8 cache ALWAYS
        # takes flash: the XLA path materializes a dequantized bf16 copy of the live
        # KV per layer (~3.6 GB extra HBM traffic per pass at 3B/B=64).
        quant = jnp.dtype(self.cache_dtype) == jnp.int8
        big = B * S * self.max_cache_len > 16 * 768 * 1536
        # target cache rows for this stage: keep + chunk + new tokens, bucketed.
        # Grown inside the chunk-prefill program (see _chunk_prefill grow_to) — only
        # reachable from a right_size_cache=True stage-1 cache; the default path
        # allocates full-size up front and right-sizes READS via attend_len instead.
        T_old = cache.k[0].shape[2]
        keep_host = keep_len if isinstance(keep_len, np.ndarray) else np.asarray(keep_len)
        # per-row final extent: pad tokens beyond chunk_lens write to the drop slot
        # (see _chunk_prefill write_pos), so the bucket-padded tail of S never lands
        # in the cache — size to keep + ACTUAL chunk length + decode budget. At the
        # wave shape this is what keeps the episode inside the 1280 bucket instead
        # of tipping into 1536 (0.6 GB/cache at 3B/B=64 — the v5e HBM margin).
        need = int((keep_host + np.asarray(batch.lengths)).max()) + max_new
        T2 = T_old
        if need > T_old:
            T2 = self.max_cache_len
            for b in DEFAULT_CACHE_BUCKETS:
                if need <= b <= self.max_cache_len:
                    T2 = b
                    break
            T2 = max(T2, T_old)
        if grow_to is not None:
            T2 = max(min(grow_to, self.max_cache_len), T2)
        win_mode = int(batch.vision_meta.get("win_mode", 0)) if batch.vision_meta else 0
        # Donate the input cache ONLY when it is consumed: same-size AND no grow_to.
        # An explicit grow_to flags a REUSABLE holder (run_paired_waves seeds every
        # wave's stage 1 from the shared per-image prefix cache) — donating it when
        # its allocation happens to equal the grow target would delete the holder
        # after wave 0 ('Array has been deleted' on wave 1).
        donate = grow_to is None and T2 == T_old
        key = ("chunk", B, S, n_patches, T_old, T2, win_mode, donate)
        if key not in self._prefill_fns:
            self._prefill_fns[key] = jax.jit(
                functools.partial(self._chunk_prefill, use_flash=quant or big,
                                  grow_to=T2, win_mode=win_mode),
                # a grown cache changes shape, so the input can't alias the output
                # (donating anyway emits a per-layer warning; the buffer is freed
                # after its last use either way)
                donate_argnums=(7,) if donate else (),
            )
        chunk_prefill = self._prefill_fns[key]
        meta = None
        if batch.vision_meta is not None:
            meta = {k: jnp.asarray(v) for k, v in batch.vision_meta.items() if k != "win_mode"}
        pv = jnp.asarray(batch.pixel_values) if batch.pixel_values is not None else None
        first_logits, cache = chunk_prefill(
            self.params, jnp.asarray(batch.input_ids), jnp.asarray(batch.lengths),
            jnp.asarray(keep_len, jnp.int32) if not isinstance(keep_len, jnp.ndarray) else keep_len,
            jnp.asarray(batch.position_ids), pv, meta, cache,
        )
        return first_logits, cache, self._attend_bucket(need, T2)

    def run_decode(self, first_logits, cache, next_pos, gen: GenerationConfig, *,
                   seed: int = 0, attend: Optional[int] = None, done0=None):
        """Run the while-loop decode program. Returns (tokens_device (B, max_new),
        cache). attend: STATIC prefix read span (see _attend_bucket); done0: rows
        already finished (stay inert)."""
        B = first_logits.shape[0]
        stop_tokens = (self.cfg.tokens.eos, self.cfg.tokens.endoftext)
        dc_key = (B, gen.max_new_tokens, gen.temperature, gen.top_p, stop_tokens, attend)
        if dc_key not in self._decode_fns:
            self._decode_fns[dc_key] = jax.jit(
                functools.partial(
                    self._decode_loop,
                    max_new=gen.max_new_tokens,
                    temperature=gen.temperature,
                    top_p=gen.top_p,
                    stop_tokens=stop_tokens,
                    attend_len=attend,
                ),
                # donate the cache: without this the program holds input AND output
                # copies of the full KV tree (the while_loop's carry can alias
                # internally but the program boundary cannot) — 2x cache HBM at peak
                donate_argnums=(2,),
            )
        if done0 is None:  # constant arg structure: one trace per dc_key
            done0 = jnp.zeros((B,), jnp.bool_)
        return self._decode_fns[dc_key](
            self.params, first_logits, cache, jnp.asarray(next_pos),
            jax.random.key(seed), done0,
        )

    def run_decode_pair(self, a, b, *, steps: int, temperature: float = 0.0,
                        top_p: float = 1.0, seed: int = 0,
                        temperature_b: Optional[float] = None,
                        top_p_b: Optional[float] = None):
        """Co-batched decode of two stages sharing one dense pass per step (see
        _decode_loop_pair / decoder_forward_pair): the per-step weight stream is read
        once for both groups.

        a, b: (first_logits, cache, next_pos, attend, done0-or-None) per group.
        temperature_b/top_p_b: group b's sampling params (default: group a's).
        Returns (buf_a, done_a, next_logits_a, cache_a, buf_b, done_b, next_logits_b,
        cache_b): either group resumes its remaining tokens via
        run_decode(next_logits_*, cache_*, next_pos + steps, ..., done0=done_*)."""
        logits_a, cache_a, pos_a, attend_a, done0_a = a
        logits_b, cache_b, pos_b, attend_b, done0_b = b
        stop_tokens = (self.cfg.tokens.eos, self.cfg.tokens.endoftext)
        Ba, Bb = logits_a.shape[0], logits_b.shape[0]
        if done0_a is None:  # constant arg structure: one trace per program key
            done0_a = jnp.zeros((Ba,), jnp.bool_)
        if done0_b is None:
            done0_b = jnp.zeros((Bb,), jnp.bool_)
        Ta, Tb = cache_a.k[0].shape[2], cache_b.k[0].shape[2]
        key = ("pair", Ba, Bb, Ta, Tb, steps, temperature, top_p,
               temperature_b, top_p_b, stop_tokens, attend_a, attend_b)
        if key not in self._decode_fns:
            self._decode_fns[key] = jax.jit(
                functools.partial(
                    self._decode_loop_pair,
                    steps=steps, temperature=temperature, top_p=top_p,
                    temperature_b=temperature_b, top_p_b=top_p_b,
                    stop_tokens=stop_tokens, attend_a=attend_a, attend_b=attend_b,
                ),
                # donate BOTH caches: un-donated, the pair program would hold input
                # and output copies of two full KV trees simultaneously (~11 GB at
                # 3B/B=48 before weights — a guaranteed OOM on v5e)
                donate_argnums=(2, 5),
            )
        return self._decode_fns[key](
            self.params, logits_a, cache_a, jnp.asarray(pos_a),
            logits_b, cache_b, jnp.asarray(pos_b), jax.random.key(seed),
            done0_a, done0_b,
        )

    def continue_generate(
        self,
        cache,
        batch: PreparedBatch,
        keep_len: np.ndarray,
        gen: GenerationConfig = GenerationConfig(),
        *,
        seed: int = 0,
        return_cache: bool = False,
        inert_mask: Optional[np.ndarray] = None,
        block: bool = True,
    ):
        """Continue generation from a prior stage's cache: truncate each row's cache to
        keep_len[b] (dropping e.g. the <answer> tail), prefill only the continuation
        chunk (stage-2 vision tokens), then decode.

        This is the two-stage prefix-reuse optimization: the reference re-runs the
        full stitched prompt through prefill (grpo_trainer.py:611, infer.py:247); here
        stage 2 prefills ~300 tokens instead of ~1200.

        block=False: dispatch-only — returns (tokens_device, cache) WITHOUT the
        blocking readback (same contract as generate(block=False)): the caller issues
        tokens_device.copy_to_host_async() and materializes later, so the post-compute
        readback round trip rides under other work instead of serializing each wave."""
        B, S = batch.input_ids.shape
        import os
        import time

        timing = os.environ.get("ZOOMEARTH_GEN_TIMING") == "1"
        t0 = time.time()
        first_logits, cache, attend = self.run_chunk_prefill(
            cache, batch, keep_len, max_new=gen.max_new_tokens
        )
        if timing:
            np.asarray(first_logits[0, :1])  # blocking readback: prefill wall time
            t2 = time.time()
        done0 = jnp.asarray(inert_mask, bool) if inert_mask is not None else None
        tokens, cache = self.run_decode(
            first_logits, cache, batch.next_pos, gen, seed=seed, attend=attend,
            done0=done0,
        )
        if not block:
            return tokens, cache
        # register the d2h copy at dispatch time: it fires the moment the decode loop
        # completes on device. Issuing it only inside np.asarray (i.e. after blocking
        # on compute) costs a full extra host->device round trip per call on remote
        # tunnels (measured ~1.5 s on axon for a 30 KB buffer).
        tokens.copy_to_host_async()
        tokens = np.asarray(tokens)
        if timing:
            import sys

            print(f"    [gen2] chunk_prefill {t2 - t0:.2f}s "
                  f"| decode {time.time() - t2:.2f}s", file=sys.stderr)
        out = self.trim_generated(tokens)
        if return_cache:
            return out, cache
        return out

    # -- public API ---------------------------------------------------------

    def generate(
        self,
        batch: PreparedBatch,
        gen: GenerationConfig = GenerationConfig(),
        *,
        seed: int = 0,
        return_cache: bool = False,
        block: bool = True,
    ):
        """Run prefill + decode. Returns list of generated token lists (stop token
        excluded), right-trimmed.

        block=False: dispatch-only — returns (tokens_device, cache) WITHOUT the
        blocking readback; call trim_generated(np.asarray(tokens_device)) later.
        Lets a driver software-pipeline waves: dispatch wave n's generation, then do
        wave n-1's host work (stage-2 crops) while the device runs."""
        B, S = batch.input_ids.shape
        if S + gen.max_new_tokens > self.max_cache_len:
            raise ValueError(
                f"prompt bucket ({S}) + max_new_tokens ({gen.max_new_tokens}) exceeds "
                f"max_cache_len ({self.max_cache_len})"
            )
        import os
        import time

        timing = os.environ.get("ZOOMEARTH_GEN_TIMING") == "1"
        t0 = time.time()
        first_logits, cache, attend = self.run_prefill(batch, max_new=gen.max_new_tokens)
        if timing:
            np.asarray(first_logits[0, :1])  # blocking readback: prefill wall time
            t2 = time.time()
        tokens, cache = self.run_decode(
            first_logits, cache, batch.next_pos, gen, seed=seed, attend=attend
        )
        if timing:
            import sys

            np.asarray(tokens[0, :1])
            print(f"    [gen1] prefill {t2 - t0:.2f}s | decode {time.time() - t2:.2f}s",
                  file=sys.stderr)
        if not block:
            return tokens, cache
        tokens.copy_to_host_async()  # see continue_generate: avoids a post-compute RTT
        out = self.trim_generated(np.asarray(tokens))
        if return_cache:
            return out, cache
        return out

    def trim_generated(self, tokens: np.ndarray):
        """(B, max_new) raw decode buffer -> per-row lists trimmed at the stop token."""
        stop_tokens = (self.cfg.tokens.eos, self.cfg.tokens.endoftext)
        out = []
        for b in range(tokens.shape[0]):
            row = tokens[b]
            stops = np.isin(row, stop_tokens)
            end = int(np.argmax(stops)) if stops.any() else len(row)
            out.append(row[:end].tolist())
        return out
