"""Qwen2.5 text decoder: RMSNorm + GQA attention with M-RoPE + SwiGLU MLP.

Functional JAX implementation of the reference decoder stack
(modeling_qwen2_vl.py:788-1280), with a single forward that serves prefill, training
(full-sequence logits), and single-step KV-cache decode — the cache is just an optional
(k, v, len) pytree threaded through.

Params pytree (see params.init_text_params):
  embed.weight; layers[i].{input_ln,post_ln}.scale,
  .attn.{wq,bq,wk,bk,wv,bv,wo}, .mlp.{wg,wu,wd}; final_ln.scale; lm_head.weight (absent
  when tied).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TextConfig
from ..ops.attention import causal_attention, decode_attention, decode_attention_q8
from ..ops.quant import qdot


def _use_flash() -> bool:
    import os

    return jax.default_backend() == "tpu" and not os.environ.get("ZOOMEARTH_NO_FLASH")


def _use_flash_decode() -> bool:
    # OPT-IN (ZOOMEARTH_FLASH_DECODE=1): standalone the Pallas decode kernel beats the
    # XLA attention chain (65 vs 75 us/call at B=32), but inside the full decode loop
    # it LOSES (11.0 vs 9.8 ms/step at B=32; end-to-end bench 4.07 vs 5.62 q/s at
    # B=64) — the pallas_call boundary blocks XLA from overlapping neighbor weight
    # streams, and the penalty grows with batch. Kept for long-context regimes where
    # length-proportional cache reads dominate scheduling effects.
    import os

    return jax.default_backend() == "tpu" and os.environ.get("ZOOMEARTH_FLASH_DECODE") == "1"


def _use_flash_decode_q8() -> bool:
    # OPT-IN (ZOOMEARTH_FLASH_DECODE_Q8=1), same verdict as the bf16 kernel: despite
    # streaming HALF the cache bytes, the int8 Pallas decode kernel measured 24.4
    # ms/step IN-MODEL at B=64/T=1536 vs 21.4 for XLA's decode_attention_q8 and 14.8
    # for the bf16 cache — the pallas_call boundary blocks XLA's cross-op weight
    # prefetch, and that scheduling loss exceeds the bandwidth win (BASELINE.md r4).
    import os

    return jax.default_backend() == "tpu" and os.environ.get("ZOOMEARTH_FLASH_DECODE_Q8") == "1"

from .rope import apply_rotary, mrope_cos_sin
from .vit import rms_norm


class KVCache(NamedTuple):
    """Preallocated KV cache: per-layer tuples of (B, Hkv, T, D) arrays (a flat pytree —
    per-layer dynamic_update_slice aliases in place under jit; a single stacked
    (L, B, T, ...) array would force whole-cache copies on every layer update).

    Layout note: the two MINOR dims must be (T, D) — TPU HBM tiles the last two dims
    to (8, 128)-multiples, so a (..., Hkv=2, 128) minor layout physically pads Hkv to 8
    and quadruples both cache footprint and decode-step cache reads (measured ~3 ms/step
    at batch 16 x 1536 ctx on v5e).

    int8 mode (create(dtype=jnp.int8), the vLLM kv-cache-dtype=int8 equivalent): k/v
    hold per-token-quantized values and kscale/vscale (B, Hkv, T) bf16 the per-token
    scales. Decode attention stays EXACT w.r.t. the quantized values: per-token scales
    commute through both attention matmuls (logits *= ks per column; p *= vs before
    p@v), so the int8 values feed the MXU directly and the hot loop reads half the
    cache bytes. Halves footprint too (unlocks larger slot counts before OOM)."""

    k: Tuple[jnp.ndarray, ...]
    v: Tuple[jnp.ndarray, ...]
    length: jnp.ndarray  # (B,) valid entries
    kscale: Optional[Tuple[jnp.ndarray, ...]] = None  # (B, Hkv, T) per-token, int8 mode
    vscale: Optional[Tuple[jnp.ndarray, ...]] = None

    @staticmethod
    def create(cfg: TextConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> "KVCache":
        dtype = jnp.dtype(dtype)
        shape = (batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
        L = cfg.num_hidden_layers
        scales = None
        if dtype == jnp.int8:
            scales = tuple(
                jnp.zeros(shape[:3], jnp.bfloat16) for _ in range(L)
            )
        return KVCache(
            k=tuple(jnp.zeros(shape, dtype) for _ in range(L)),
            v=tuple(jnp.zeros(shape, dtype) for _ in range(L)),
            length=jnp.zeros((batch,), jnp.int32),
            kscale=scales,
            vscale=tuple(jnp.zeros(shape[:3], jnp.bfloat16) for _ in range(L)) if scales is not None else None,
        )


def _quantize_kv(x: jnp.ndarray):
    """(B, S, Hkv, D) -> (int8 values, (B, S, Hkv) bf16 scales), symmetric per token."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def _attn_layer(
    p,
    cfg: TextConfig,
    x,  # (B, S, E)
    cos,
    sin,  # (B, S, head_dim)
    positions,  # (B, S)
    attn_valid,  # (B, S) bool: real (non-pad) input tokens
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]],  # (B, Hkv, T, D) existing cache slice
    cache_len: Optional[jnp.ndarray],  # (B,)
    use_flash: bool = False,  # inference-only (no VJP); opt-in: XLA wins at S<~2k
    write_pos: Optional[jnp.ndarray] = None,  # (B, S) explicit kv write slots; >= T drops
    attend_len: Optional[int] = None,  # STATIC: decode attends only cache[:, :, :attend_len]
):
    B, S, _ = x.shape
    H, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    if "wqkv" in p:
        # fused serving layout (ops.quant.fuse_decoder_matmuls): one matmul, then split
        qkv = qdot(x, p["wqkv"]) + p["bqkv"]
        q = qkv[..., : H * D].reshape(B, S, H, D)
        k = qkv[..., H * D : (H + Hkv) * D].reshape(B, S, Hkv, D)
        v = qkv[..., (H + Hkv) * D :].reshape(B, S, Hkv, D)
    else:
        q = (qdot(x, p["wq"]) + p["bq"]).reshape(B, S, H, D)
        k = (qdot(x, p["wk"]) + p["bk"]).reshape(B, S, Hkv, D)
        v = (qdot(x, p["wv"]) + p["bv"]).reshape(B, S, Hkv, D)
    q = apply_rotary(q, cos, sin)
    k = apply_rotary(k, cos, sin)

    if cache_kv is None:
        if use_flash:
            from ..ops.flash_causal import flash_causal_attention

            # right-padded inputs: causality alone excludes the tail pads
            out = flash_causal_attention(
                q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                positions, jnp.full((B,), S, jnp.int32),
            )
        else:
            out = causal_attention(
                q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                positions=positions, kv_positions=positions, valid=attn_valid,
            )
        new_kv = (k, v)
    else:
        # cache layout: (B, Hkv, T, D) — scatter the (B, S, Hkv, D) projections in
        # kv-head-major order at each row's cache_len
        k_cache, v_cache, ks_cache, vs_cache = cache_kv
        quant = k_cache.dtype == jnp.int8
        if quant:
            k_store, ks_new = _quantize_kv(k)
            v_store, vs_new = _quantize_kv(v)
        else:
            k_store, v_store = k, v
        if write_pos is None and S == 1:
            # Single-token decode writes ALWAYS go through the drop-mode scatter: the
            # vmap'd dynamic_update_slice below lowers to ~69 us per layer-call on v5e
            # (~2.5 ms/step across 36 layers, measured via carry-threaded scan A/B)
            # while this scatter is free; it also DROPS out-of-range writes instead of
            # clamping them onto valid kv (length-overrun safety for idle engine rows).
            write_pos = cache_len[:, None]
        if write_pos is not None:
            # Explicit per-token write slots (chunk prefill): out-of-range positions
            # (>= T) are DROPPED — this is how pad tokens and non-participating rows
            # write nothing. The dynamic_update_slice path below instead CLAMPS starts
            # that would overflow, silently shifting the write window onto valid kv.
            bidx = jnp.arange(k_cache.shape[0])[:, None]
            k_cache = k_cache.at[bidx, :, write_pos, :].set(k_store.astype(k_cache.dtype), mode="drop")
            v_cache = v_cache.at[bidx, :, write_pos, :].set(v_store.astype(v_cache.dtype), mode="drop")
            if quant:
                ks_cache = ks_cache.at[bidx, :, write_pos].set(ks_new, mode="drop")
                vs_cache = vs_cache.at[bidx, :, write_pos].set(vs_new, mode="drop")
        else:
            kT = k_store.transpose(0, 2, 1, 3)  # (B, Hkv, S, D)
            vT = v_store.transpose(0, 2, 1, 3)
            scatter = jax.vmap(lambda c, x, i: jax.lax.dynamic_update_slice(c, x, (0, i, 0)))
            idx = cache_len  # (B,)
            k_cache = scatter(k_cache, kT.astype(k_cache.dtype), idx)
            v_cache = scatter(v_cache, vT.astype(v_cache.dtype), idx)
            if quant:
                scatter1 = jax.vmap(lambda c, x, i: jax.lax.dynamic_update_slice(c, x, (0, i)))
                ks_cache = scatter1(ks_cache, ks_new.transpose(0, 2, 1), idx)
                vs_cache = scatter1(vs_cache, vs_new.transpose(0, 2, 1), idx)
        # Decode reads the WHOLE cache allocation every step (masked) — attend_len
        # (STATIC, a bucket >= this stage's prompt+new extent) restricts the read to a
        # prefix slice of the full-size buffer. Same bandwidth saving as allocating a
        # right-sized cache, but with NO growth copy at the stage-2 transition (the
        # jnp.pad growth held old+new trees simultaneously and OOM'd big-batch waves)
        # and donation-stable shapes. Writes (drop-scatter above) still target the
        # full buffer; callers guarantee every valid slot index < attend_len.
        if S == 1 and attend_len is not None and attend_len < k_cache.shape[2]:
            k_att = k_cache[:, :, :attend_len, :]
            v_att = v_cache[:, :, :attend_len, :]
            ks_att = ks_cache[:, :, :attend_len] if quant else None
            vs_att = vs_cache[:, :, :attend_len] if quant else None
        else:
            k_att, v_att, ks_att, vs_att = k_cache, v_cache, ks_cache, vs_cache
        if S == 1 and quant:
            T = k_att.shape[2]
            if _use_flash_decode_q8() and T % 512 == 0 and D % 128 == 0:
                # opt-in int8 Pallas decode (see _use_flash_decode_q8: loses in-model
                # to XLA q8 at our shapes despite half the cache bytes)
                from ..ops.flash_decode import flash_decode_attention

                out = flash_decode_attention(
                    q, k_att, v_att, cache_len + 1, ks_att, vs_att
                )
            else:
                # int8 decode attention: int8 values feed the MXU directly; per-token
                # scales applied to logits columns (K) and to p rows (V) — exact algebra.
                out = decode_attention_q8(
                    q, k_att, v_att, ks_att, vs_att, kv_len=cache_len + 1
                )
        elif S == 1:
            # Single-step decode: attend over the prefix + the new token.
            T = k_att.shape[2]
            if _use_flash_decode() and T % 512 == 0 and D % 128 == 0:
                from ..ops.flash_decode import flash_decode_attention

                out = flash_decode_attention(q, k_att, v_att, cache_len + 1)
            else:
                out = decode_attention(q, k_att, v_att, kv_len=cache_len + 1)
        elif quant and use_flash:
            # int8 chunk prefill: the flash kernel streams int8 values (half the
            # HBM bytes) and applies the per-token scales in VMEM — a dequantized
            # (B, Hkv, T, D) bf16 copy per layer would cost ~3.6 GB of extra
            # traffic per prefill pass at 3B scale (measured: killed the win)
            from ..ops.flash_causal import flash_causal_attention

            out = flash_causal_attention(
                q, k_cache, v_cache, positions, cache_len + S, ks_cache, vs_cache
            )
        elif use_flash:
            # Large-batch chunk prefill: XLA's masked attention materializes a
            # (B, H, S, T) fp32 logits tensor (3.5 GB at B=48/S=768/T=1536 — OOM);
            # the Pallas causal kernel streams the kv-head-major cache directly.
            from ..ops.flash_causal import flash_causal_attention

            out = flash_causal_attention(q, k_cache, v_cache, positions, cache_len + S)
        else:
            # Chunked prefill into an existing cache (stage-2 continuation): XLA's
            # fused attention wins at small B*S*T (measured on-TPU). int8 mode takes
            # a transient dequantized view (small sizes only).
            if quant:
                k_read = k_cache.astype(jnp.bfloat16) * ks_cache[..., None]
                v_read = v_cache.astype(jnp.bfloat16) * vs_cache[..., None]
            else:
                k_read, v_read = k_cache, v_cache
            T = k_cache.shape[2]
            slot = jnp.arange(T)[None, :]
            valid_t = slot < (cache_len[:, None] + S)
            # kv position: cache slot order == position order per sequence
            out = causal_attention(
                q, k_read, v_read,
                positions=positions, kv_positions=slot, valid=valid_t,
            )
        new_kv = (k_cache, v_cache, ks_cache, vs_cache)
    out = qdot(out.reshape(B, S, H * D), p["wo"])
    return out, new_kv


def _mlp(p, x):
    if "wgu" in p:  # fused serving layout: one gate|up matmul, then split
        gu = qdot(x, p["wgu"])
        F = gu.shape[-1] // 2
        return qdot(jax.nn.silu(gu[..., :F]) * gu[..., F:], p["wd"])
    return qdot(jax.nn.silu(qdot(x, p["wg"])) * qdot(x, p["wu"]), p["wd"])


def _decode_write_attend(q, k, v, cache_kv, cache_len, attend_len):
    """Single-token (S==1) cache write + attention for ONE row group: quantize when
    the cache is int8, drop-scatter the new token at cache_len, attend over the
    STATIC attend_len prefix. Mirrors _attn_layer's S==1 path (same drop-scatter and
    prefix-slice rationale — see the comments there); used by decoder_forward_pair
    where the dense matmuls run on a concatenated batch but each group keeps its own
    cache and attend span."""
    k_cache, v_cache, ks_cache, vs_cache = cache_kv
    quant = k_cache.dtype == jnp.int8
    if quant:
        k_store, ks_new = _quantize_kv(k)
        v_store, vs_new = _quantize_kv(v)
    else:
        k_store, v_store = k, v
    write_pos = cache_len[:, None]
    bidx = jnp.arange(k_cache.shape[0])[:, None]
    k_cache = k_cache.at[bidx, :, write_pos, :].set(k_store.astype(k_cache.dtype), mode="drop")
    v_cache = v_cache.at[bidx, :, write_pos, :].set(v_store.astype(v_cache.dtype), mode="drop")
    if quant:
        ks_cache = ks_cache.at[bidx, :, write_pos].set(ks_new, mode="drop")
        vs_cache = vs_cache.at[bidx, :, write_pos].set(vs_new, mode="drop")
    if attend_len is not None and attend_len < k_cache.shape[2]:
        k_att = k_cache[:, :, :attend_len, :]
        v_att = v_cache[:, :, :attend_len, :]
        ks_att = ks_cache[:, :, :attend_len] if quant else None
        vs_att = vs_cache[:, :, :attend_len] if quant else None
    else:
        k_att, v_att, ks_att, vs_att = k_cache, v_cache, ks_cache, vs_cache
    if quant:
        out = decode_attention_q8(q, k_att, v_att, ks_att, vs_att, kv_len=cache_len + 1)
    else:
        out = decode_attention(q, k_att, v_att, kv_len=cache_len + 1)
    return out, (k_cache, v_cache, ks_cache, vs_cache)


def decoder_forward_pair(
    params,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (Ba + Bb, 1, E) concatenated decode batch
    position_ids: jnp.ndarray,  # (3, Ba + Bb, 1)
    cache_a: KVCache,
    cache_b: KVCache,
    attend_a: Optional[int] = None,
    attend_b: Optional[int] = None,
):
    """One decode step over TWO independent caches sharing a single dense pass.

    Rows [0:Ba] advance cache_a, rows [Ba:] advance cache_b. The qkv / output /
    MLP matmuls, norms, and (at the caller) the logits head all run on the
    CONCATENATED batch — the ~3 GB/step weight stream is read ONCE for both groups.
    The software-pipelined wave runner otherwise streams it separately for wave n's
    stage-1 decode and wave n-1's stage-2 decode (reference surface: vLLM's
    continuous batching folds all live sequences into one step for the same reason,
    README.md:105-112). Attention runs per group against its own cache with its own
    STATIC attend span, so a short-context group never pays the long group's cache
    reads. Returns (hidden, new_cache_a, new_cache_b) with lengths advanced by 1."""
    Ba = cache_a.k[0].shape[0]
    B, S, _ = inputs_embeds.shape
    assert S == 1, "pair decode is single-token only"
    H, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    cos, sin = mrope_cos_sin(position_ids, cfg.head_dim, cfg.mrope_section, cfg.rope_theta)
    x = inputs_embeds
    quant = cache_a.kscale is not None
    new_a = {"k": [], "v": [], "ks": [], "vs": []}
    new_b = {"k": [], "v": [], "ks": [], "vs": []}
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_ln"]["scale"], cfg.rms_norm_eps)
        p = layer["attn"]
        if "wqkv" in p:
            qkv = qdot(h, p["wqkv"]) + p["bqkv"]
            q = qkv[..., : H * D].reshape(B, S, H, D)
            k = qkv[..., H * D : (H + Hkv) * D].reshape(B, S, Hkv, D)
            v = qkv[..., (H + Hkv) * D :].reshape(B, S, Hkv, D)
        else:
            q = (qdot(h, p["wq"]) + p["bq"]).reshape(B, S, H, D)
            k = (qdot(h, p["wk"]) + p["bk"]).reshape(B, S, Hkv, D)
            v = (qdot(h, p["wv"]) + p["bv"]).reshape(B, S, Hkv, D)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        out_a, kv_a = _decode_write_attend(
            q[:Ba], k[:Ba], v[:Ba],
            (cache_a.k[i], cache_a.v[i],
             cache_a.kscale[i] if quant else None,
             cache_a.vscale[i] if quant else None),
            cache_a.length, attend_a,
        )
        out_b, kv_b = _decode_write_attend(
            q[Ba:], k[Ba:], v[Ba:],
            (cache_b.k[i], cache_b.v[i],
             cache_b.kscale[i] if quant else None,
             cache_b.vscale[i] if quant else None),
            cache_b.length, attend_b,
        )
        for store, kv in ((new_a, kv_a), (new_b, kv_b)):
            store["k"].append(kv[0])
            store["v"].append(kv[1])
            if quant:
                store["ks"].append(kv[2])
                store["vs"].append(kv[3])
        out = jnp.concatenate([out_a, out_b], axis=0)
        x = x + qdot(out.reshape(B, S, H * D), p["wo"])
        h = rms_norm(x, layer["post_ln"]["scale"], cfg.rms_norm_eps)
        x = x + _mlp(layer["mlp"], h)
    x = rms_norm(x, params["final_ln"]["scale"], cfg.rms_norm_eps)

    def repack(cache, store):
        return KVCache(
            k=tuple(store["k"]), v=tuple(store["v"]), length=cache.length + 1,
            kscale=tuple(store["ks"]) if quant else None,
            vscale=tuple(store["vs"]) if quant else None,
        )

    return x, repack(cache_a, new_a), repack(cache_b, new_b)


def decoder_forward(
    params,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, E)
    position_ids: jnp.ndarray,  # (3, B, S) M-RoPE positions
    attn_positions: Optional[jnp.ndarray] = None,  # (B, S) causal-order positions (cache slots)
    attn_valid: Optional[jnp.ndarray] = None,  # (B, S) bool
    cache: Optional[KVCache] = None,
    update_cache_len: bool = True,
    use_flash: bool = False,
    write_pos: Optional[jnp.ndarray] = None,
    attend_len: Optional[int] = None,
):
    """Run the decoder stack. Returns (hidden_states, new_cache).

    - Training/no-cache prefill: cache=None, attn_positions defaults to iota.
    - Cache prefill/decode: attn_positions are cache slot indices (cache_len + iota).
    M-RoPE position_ids drive rotary; attn_positions drive causal masking — they differ
    because M-RoPE compresses image-token positions.
    """
    B, S, _ = inputs_embeds.shape
    if attn_positions is None:
        attn_positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    if attn_valid is None:
        attn_valid = jnp.ones((B, S), jnp.bool_)
    cos, sin = mrope_cos_sin(position_ids, cfg.head_dim, cfg.mrope_section, cfg.rope_theta)
    x = inputs_embeds
    new_k, new_v, new_ks, new_vs = [], [], [], []
    quant_cache = cache is not None and cache.kscale is not None
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_ln"]["scale"], cfg.rms_norm_eps)
        cache_kv = None
        if cache is not None:
            cache_kv = (
                cache.k[i], cache.v[i],
                cache.kscale[i] if quant_cache else None,
                cache.vscale[i] if quant_cache else None,
            )
        cache_len = cache.length if cache is not None else None
        attn_out, kv = _attn_layer(
            layer["attn"], cfg, h, cos, sin, attn_positions, attn_valid, cache_kv, cache_len,
            use_flash=use_flash and _use_flash() and S > 1,
            write_pos=write_pos,
            attend_len=attend_len,
        )
        x = x + attn_out
        h = rms_norm(x, layer["post_ln"]["scale"], cfg.rms_norm_eps)
        x = x + _mlp(layer["mlp"], h)
        if cache is not None:
            new_k.append(kv[0])
            new_v.append(kv[1])
            if quant_cache:
                new_ks.append(kv[2])
                new_vs.append(kv[3])
    x = rms_norm(x, params["final_ln"]["scale"], cfg.rms_norm_eps)
    new_cache = None
    if cache is not None:
        new_len = cache.length + S if update_cache_len else cache.length
        new_cache = KVCache(
            k=tuple(new_k), v=tuple(new_v), length=new_len,
            kscale=tuple(new_ks) if quant_cache else None,
            vscale=tuple(new_vs) if quant_cache else None,
        )
    return x, new_cache


def logits_from_hidden(params, cfg: TextConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """(B, S, E) -> (B, S, V) logits, fp32 ACCUMULATION in the weights' native dtype.

    preferred_element_type=f32 gives fp32 MXU accumulation without materializing an
    fp32 copy of the 151936xE embedding (which costs 1.2 GB of HBM traffic per decode
    step at 3B scale). With fp32 params (CPU parity tests) this is exact fp32.

    int8 serving (quantize_decoder_int8(lm_head=True)): a quantized copy of the head
    lives at params["lm_head_q8"] — the mixed-dtype dot streams half the bytes; the
    per-output-column scale is applied to the fp32 logits (exact algebra)."""
    if "lm_head_q8" in params:
        w = params["lm_head_q8"]
        y = jax.lax.dot_general(
            hidden, w["q"], (((hidden.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y * w["s"].astype(jnp.float32)
    if cfg.tie_word_embeddings:
        w = params["embed"]["weight"].T
    else:
        w = params["lm_head"]["weight"]
    return jnp.dot(hidden.astype(w.dtype), w, preferred_element_type=jnp.float32)
