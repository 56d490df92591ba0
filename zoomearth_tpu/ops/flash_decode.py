"""Pallas TPU decode attention over the slot-contiguous KV cache.

The decode step's dominant cost is NOT the weight matmuls: ablation on v5e-1
(scripts/profile_decode.py, readback-timed) at B=32/T=1536/int8 measured 14.5 ms/step
full vs 4.8 ms/step with attention removed — XLA's masked-GQA einsum chain costs
~9.7 ms against a ~2.2 ms cache-streaming bound (50 MB of KV per layer-call at
819 GB/s), and a transposed-K layout does not help (measured). This kernel replaces it
(reference equivalent: the flash-attn/vLLM CUDA decode kernels, SURVEY.md §2.4).

Design (v2 — granularity matters more than anything):
- one program per (row-block, kv-chunk): RB rows x ALL kv heads x a 512-token kv chunk.
  A first version at (row, kv-head, 256-chunk) granularity ran 384 grid steps per call
  and LOST to XLA (11.0 vs 7.7 ms/36-layer step: per-step pipeline overhead swamps the
  82 us of useful HBM traffic). At (4-row, 512-chunk) the grid is 12 steps of ~1 MB
  blocks — big enough for the pipeline to stream at HBM rate.
- per-row-block length via scalar prefetch: chunks beyond the block's max live chunk
  map to the previous chunk index, so the Pallas pipeline SKIPS their fetch — cache
  reads scale with live tokens, not allocated T. (Wave-mode rows decode in lockstep,
  so the per-block max loses almost nothing; engine slots vary more but still win.)
- online softmax in f32 scratch across the chunk grid dimension.

Layout matches the cache: k/v (B, Hkv, T, D) kv-head-major (decoder.KVCache docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(ncb_ref, len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr, *, chunk, scale, quant):
    bb = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(c < ncb_ref[bb])
    def _():
        RB, Hkv, G, D = q_ref.shape
        N = RB * Hkv
        q = q_ref[...].astype(jnp.float32).reshape(N, G, D) * scale
        k = k_ref[...].astype(jnp.float32).reshape(N, chunk, D)
        v = v_ref[...].astype(jnp.float32).reshape(N, chunk, D)
        # batched (G, D) @ (D, C) per (row, kv-head)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (N, G, C)
        if quant:
            # int8 cache: values stream from HBM at half the bytes; the per-token
            # scales fold into logit columns here and into p rows before the pv dot
            # (exact algebra, decode_attention_q8 / flash_causal quant semantics)
            logits = logits * ks_ref[...].astype(jnp.float32).reshape(N, 1, chunk)
        pos = c * chunk + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
        # per-row length bound: RB scalar reads from SMEM, selected onto rows via iota
        # (len_ref is scalar-prefetched; tensor-indexed gathers from SMEM don't lower)
        row_id = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) // Hkv  # 0..RB-1
        bound = jnp.zeros_like(pos)
        for r in range(RB):
            bound = jnp.where(row_id == r, len_ref[bb * RB + r], bound)
        logits = jnp.where(pos < bound, logits, NEG_INF)
        m_prev = m_scr[...].reshape(N, G, 1)
        m_blk = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_scr[...].reshape(N, G, 1) * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quant:
            p = p * vs_ref[...].astype(jnp.float32).reshape(N, 1, chunk)
        pv = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (N, G, D)
        acc_scr[...] = acc_scr[...] * alpha.reshape(N * G, 1) + pv.reshape(N * G, D)
        m_scr[...] = m_new.reshape(N * G, 1)
        l_scr[...] = l_new.reshape(N * G, 1)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        RB, Hkv, G, D = o_ref.shape
        out = acc_scr[...] / jnp.maximum(l_scr[...], 1e-30)
        o_ref[...] = out.reshape(RB, Hkv, G, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def flash_decode_attention(
    q: jnp.ndarray,  # (B, 1, H, D) or (B, H, D) single decode step
    k_cache: jnp.ndarray,  # (B, Hkv, T, D)
    v_cache: jnp.ndarray,
    kv_len: jnp.ndarray,  # (B,) valid kv entries (new token included)
    ks=None,  # (B, Hkv, T) per-token scales -> k/v are int8 (KVCache int8 mode)
    vs=None,
    *,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """GQA decode attention. Returns the same rank as q, in q.dtype.

    T must be a multiple of `chunk`. Rows attend to their first kv_len slots; chunk
    fetches beyond each row-block's max live chunk are skipped entirely. With ks/vs,
    k/v hold int8 per-token-quantized values: the kernel streams them at half the
    HBM bytes and applies the scales in VMEM (exact decode_attention_q8 algebra)."""
    had_s = q.ndim == 4
    if had_s:
        q = q[:, 0]
    B, H, D = q.shape
    Hkv, T = k_cache.shape[1], k_cache.shape[2]
    G = H // Hkv
    if T % chunk:
        raise ValueError(f"T ({T}) must be a multiple of chunk ({chunk})")
    RB = next(r for r in (4, 2, 1) if B % r == 0)
    NC = T // chunk
    scale = D**-0.5
    quant = ks is not None
    kv_len = jnp.clip(kv_len.astype(jnp.int32), 0, T)
    n_chunks = jnp.maximum((kv_len + chunk - 1) // chunk, 1)  # >=1: always one live block
    ncb = jnp.max(n_chunks.reshape(B // RB, RB), axis=1)  # per row-block max

    if quant:
        ks2 = ks.astype(jnp.bfloat16)
        vs2 = vs.astype(jnp.bfloat16)
    else:  # minimal dummies: the quant branch is compiled out, inputs must just exist
        ks2 = jnp.zeros((B, Hkv, chunk), jnp.bfloat16)
        vs2 = ks2
    # dead-chunk skip for scale blocks mirrors k/v; dummies always map to chunk 0
    s_idx = (lambda bb, c, ncb, ln: (bb, 0, jnp.minimum(c, ncb[bb] - 1))) if quant else (
        lambda bb, c, ncb, ln: (bb, 0, 0))

    qg = q.reshape(B, Hkv, G, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ncb (drives the chunk-skip index maps), kv_len
        grid=(B // RB, NC),
        in_specs=[
            pl.BlockSpec((RB, Hkv, G, D), lambda bb, c, ncb, ln: (bb, 0, 0, 0)),
            # dead chunks (c >= ncb[bb]) re-map to the block's last live chunk: same
            # index as the previous grid step -> the pipeline skips the fetch
            pl.BlockSpec((RB, Hkv, chunk, D), lambda bb, c, ncb, ln: (bb, 0, jnp.minimum(c, ncb[bb] - 1), 0)),
            pl.BlockSpec((RB, Hkv, chunk, D), lambda bb, c, ncb, ln: (bb, 0, jnp.minimum(c, ncb[bb] - 1), 0)),
            pl.BlockSpec((RB, Hkv, chunk), s_idx),
            pl.BlockSpec((RB, Hkv, chunk), s_idx),
        ],
        out_specs=pl.BlockSpec((RB, Hkv, G, D), lambda bb, c, ncb, ln: (bb, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((RB * Hkv * G, 1), jnp.float32),  # m
            pltpu.VMEM((RB * Hkv * G, 1), jnp.float32),  # l
            pltpu.VMEM((RB * Hkv * G, D), jnp.float32),  # acc
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, scale=scale, quant=quant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )(ncb, kv_len, qg, k_cache, v_cache, ks2, vs2)
    out = out.reshape(B, H, D)
    return out[:, None] if had_s else out
