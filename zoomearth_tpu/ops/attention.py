"""Attention ops: XLA reference implementations with segment-id masking.

This is the numerically-authoritative path (used on CPU and as the fallback);
`ops.flash_attention` provides the Pallas TPU kernel with the same interface. Both
implement the two patterns the model needs:

- `segment_attention`: unbatched packed-sequence attention for the ViT, where a
  block-diagonal mask from segment ids replaces the reference's varlen flash-attention
  `cu_seqlens` (reference modeling_qwen2_vl.py:729-772, qwen2_5vl_monkey_patch.py:35).
- `causal_attention` / `decode_attention`: batched decoder attention with GQA, used for
  prefill and single-token KV-cache decode.

Softmax always accumulates in float32 (bf16 logits argmax ties are the parity risk —
SURVEY.md §7.3 item 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of -inf: avoids NaNs for fully-masked rows


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(..., T, Hkv, D) -> (..., T, Hkv*n_rep, D) by repeating each kv head."""
    if n_rep == 1:
        return x
    return jnp.repeat(x, n_rep, axis=-2)


def _sdpa(q, k, v, mask, scale):
    """q (..., S, H, D), k/v (..., T, H, D), mask broadcastable to (..., H, S, T)."""
    logits = jnp.einsum("...shd,...thd->...hst", q, k).astype(jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...hst,...thd->...shd", probs.astype(v.dtype), v)
    return out


def segment_attention_auto(q, k, v, segment_ids, scale=None):
    """Dispatch packed varlen attention: Pallas flash kernel on TPU (never materializes
    the S×S logits), XLA reference elsewhere. Disable with ZOOMEARTH_NO_FLASH=1."""
    import os

    if jax.default_backend() == "tpu" and not os.environ.get("ZOOMEARTH_NO_FLASH"):
        from .flash_attention import flash_segment_attention

        return flash_segment_attention(q, k, v, segment_ids)
    return segment_attention(q, k, v, segment_ids, scale)


def segment_attention(q, k, v, segment_ids, scale=None):
    """Packed varlen self-attention for the ViT.

    q/k/v: (S, H, D); segment_ids: (S,) int — tokens attend only within their segment
    (window id for windowed blocks, image id for full-attention blocks). Padding tokens
    should carry a dedicated segment id; their outputs are garbage and must be dropped
    by the caller.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    mask = (segment_ids[:, None] == segment_ids[None, :])[None]  # (1, S, T)
    return _sdpa(q, k, v, mask, scale)


LOCAL_BLOCK = 64  # ViT window span in patches (112px window / 14px patch = 8x8)


def window_block_attention(q, k, v, scale=None):
    """ViT windowed attention for UNIFORM ALIGNED windows: every aligned LOCAL_BLOCK-row
    block IS exactly one window (512px crops: 32x32 grid -> all windows full), so
    attention is block-diagonal by construction — pure reshape, no gather, no mask.

    q/k/v (S, H, D) with S % LOCAL_BLOCK == 0. Pad-tail blocks self-attend; their
    outputs are garbage and dropped by the caller (same contract as segment_attention).
    Measured vs the flash segment kernel at S=49152 on v5e: ~5% faster end-to-end and
    it skips the kernel wrapper's (H, S, 128) transpose/pad copies entirely
    (scripts/probe_vit_winattn.py)."""
    S, H, D = q.shape
    blk = LOCAL_BLOCK
    nb = S // blk
    if scale is None:
        scale = D**-0.5
    qb = q.reshape(nb, blk, H, D)
    kb = k.reshape(nb, blk, H, D)
    vb = v.reshape(nb, blk, H, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qb, kb).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), vb)
    return out.reshape(S, H, D)


def gather_window_attention(q, k, v, gidx, valid, sidx, scale=None):
    """ViT windowed attention via a host-precomputed gather plan (VisionMetadata
    win_gidx/win_valid/win_sidx — models/vit.py _window_gather_plan): rows are gathered
    into a (NW, L) per-window layout, attended dense block-diagonal, and scattered back.

    Handles ANY contiguous-segment layout with spans <= L (the general resized-image
    case where windows straddle 64-row block edges). Measured on v5e at S=62208: 11.5 ms
    vs the flash segment kernel's 13.1 (isolated) and 27.3 vs 33.5 ms per full ViT block
    (in-model, scripts/probe_vit_block.py) — the flash kernel's (H, n_q) grid is
    per-program-overhead-bound at 64-row windows, while the gathers are cheap
    (~0.5 GB HBM traffic) and the batched (L, L) matmuls pipeline on the MXU.

    gidx: (NW*L,) int32 source row per gathered slot (pad slots point anywhere);
    valid: (NW, L) bool, False for pad slots (masked out as keys);
    sidx: (S,) int32 gathered-slot index of each original row.
    Plain XLA (differentiable, all backends); numerics mirror segment_attention
    (fp32 softmax; invalid-key logits at NEG_INF)."""
    S, H, D = q.shape
    NW, L = valid.shape
    if scale is None:
        scale = D**-0.5
    qg = jnp.take(q, gidx, axis=0).reshape(NW, L, H, D)
    kg = jnp.take(k, gidx, axis=0).reshape(NW, L, H, D)
    vg = jnp.take(v, gidx, axis=0).reshape(NW, L, H, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qg, kg).astype(jnp.float32) * scale
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), vg)
    return jnp.take(out.reshape(NW * L, H, D), sidx, axis=0)


def _gqa_sdpa(q, k, v, mask, scale):
    """Grouped-query attention WITHOUT materializing repeated kv heads (a jnp.repeat
    here would re-read Hq/Hkv times the cache bytes per decode step — the decode loop's
    main bandwidth hazard).

    q (B, S, H, D); k/v (B, Hkv, T, D) — kv-head-major so the (T, D) minor dims map
    cleanly onto the TPU's (8, 128) HBM tiling (a (..., Hkv, D) minor layout physically
    pads tiny Hkv up to 8 sublanes: 4x cache bytes at Hkv=2).
    mask broadcastable to (B, Hkv, G, S, T)."""
    B, S, H, D = q.shape
    Hkv = k.shape[1]
    G = H // Hkv
    qg = q.reshape(B, S, Hkv, G, D)
    logits = jnp.einsum("bskgd,bktd->bkgst", qg, k).astype(jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgst,bktd->bskgd", probs.astype(v.dtype), v)
    return out.reshape(B, S, H, D)


def causal_attention(q, k, v, *, positions=None, kv_positions=None, valid=None, scale=None):
    """Batched causal self-attention with GQA (prefill path).

    q: (B, S, H, D); k/v: (B, Hkv, T, D) kv-head-major (cache layout).
    positions: (B, S) query positions; kv_positions: (B, T) key positions — causality is
    position-based so it works with left-padded prompts and KV caches. Defaults to
    iota when omitted (S == T).
    valid: (B, T) bool mask of usable kv slots (padding = False).
    """
    B, S, H, D = q.shape
    T = k.shape[2]
    if scale is None:
        scale = D**-0.5
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    if kv_positions is None:
        kv_positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    mask = kv_positions[:, None, :] <= positions[:, :, None]  # (B, S, T)
    if valid is not None:
        mask = mask & valid[:, None, :]
    return _gqa_sdpa(q, k, v, mask[:, None, None], scale)


def decode_attention_q8(q, k_cache, v_cache, ks, vs, *, kv_len, scale=None):
    """Single-step decode over an int8-quantized KV cache (per-token scales).

    q (B, 1, H, D); k_cache/v_cache (B, Hkv, T, D) int8; ks/vs (B, Hkv, T) scales.
    EXACT w.r.t. the quantized values: q @ (k_q * ks) == (q @ k_q) * ks per logit
    column, and p @ (v_q * vs) == (p * vs) @ v_q per probability row. The int8 values
    feed the MXU directly (mixed-dtype dot, operand-pipeline conversion) — the hot
    loop reads half the cache bytes and never materializes a dequantized copy."""
    B, _, H, D = q.shape
    Hkv, T = k_cache.shape[1], k_cache.shape[2]
    G = H // Hkv
    if scale is None:
        scale = D**-0.5
    qg = q[:, 0].reshape(B, Hkv, G, D)
    # EXPLICIT bf16 casts on the int8 operands: int8 values are exact in bf16
    # (integers <= 127), so this is bit-identical to feeding int8 straight into the
    # dot — but XLA lowers the direct batched int8 dot through a MATERIALIZED bf16
    # cache copy, while the explicit convert measures ~20% faster (probe_q8_decode:
    # 0.240 -> 0.190 ms/layer-step at B=64/T=1536; both still lose to a bf16 cache's
    # 0.062 — on v5e the int8 cache is a CAPACITY lever, not a decode-speed one).
    kd = k_cache.astype(jnp.bfloat16) if k_cache.dtype == jnp.int8 else k_cache
    vd = v_cache.astype(jnp.bfloat16) if v_cache.dtype == jnp.int8 else v_cache
    logits = jax.lax.dot_general(
        qg, kd, (((3,), (3,)), ((0, 1), (0, 1))), preferred_element_type=jnp.float32
    )  # (B, Hkv, G, T)
    logits = logits * ks.astype(jnp.float32)[:, :, None, :] * scale
    valid = jnp.arange(T)[None, :] < kv_len[:, None]  # (B, T)
    logits = jnp.where(valid[:, None, None], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    p = (p * vs.astype(jnp.float32)[:, :, None, :]).astype(q.dtype)
    out = jax.lax.dot_general(
        p, vd, (((3,), (2,)), ((0, 1), (0, 1))), preferred_element_type=jnp.float32
    )  # (B, Hkv, G, D)
    return out.astype(q.dtype).reshape(B, 1, H, D)


def decode_attention(q, k_cache, v_cache, *, kv_len, scale=None):
    """Single-step decode: q (B, 1, H, D) against cache (B, Hkv, T, D).

    kv_len: (B,) number of valid cache entries per sequence (new token included).
    """
    B, _, H, D = q.shape
    T = k_cache.shape[2]
    if scale is None:
        scale = D**-0.5
    valid = jnp.arange(T)[None, :] < kv_len[:, None]  # (B, T)
    return _gqa_sdpa(q, k_cache, v_cache, valid[:, None, None, None], scale)
