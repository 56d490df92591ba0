"""Pallas TPU causal flash attention with GQA for prefill/training.

The decoder's batched causal attention (ops/attention.causal_attention) materializes
(B, Hkv, G, S, T) fp32 logits — ~2.4 GB per layer at B=16/S=1536. This kernel streams
kv blocks with online softmax and skips blocks entirely above the causal diagonal.

Layout: q (B, S, H, D), k/v (B, Hkv, T, D) kv-head-major (the cache layout — the
kernel DMA slices [b, kh, t0:t1, :], which stays tile-aligned; a (B, T, Hkv, D) layout
would slice the 2-wide Hkv dim inside the (sublane, lane) tile and Mosaic rejects it);
queries at positions[b, s] attend kv slots
t <= position (slot order == position order per row, as in our cache layout) AND
t < kv_len[b]. GQA: the G = H/Hkv query heads of a kv head are folded into the q-block
rows (block shape (G*block_q, D)) so the MXU sees one big matmul per kv head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, pos_ref, kvlen_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref, kbuf, vbuf, ksbuf, vsbuf, sems, *, block_q, block_kv, scale, G, D, quant):
    b = pl.program_id(0)
    kh = pl.program_id(1)  # kv head
    qi = pl.program_id(2)

    # q block: (block_q, G, D) -> (G*block_q, D) rows grouped by query head
    q = q_ref[...].astype(jnp.float32) * scale  # (block_q, G, D)
    q2 = q.transpose(1, 0, 2).reshape(G * block_q, D)
    pos_q = pos_ref[0, :]  # (block_q,) — this q block's positions via the BlockSpec
    kv_len = kvlen_ref[b, 0]
    # causal bound: kv slots <= max position in this q block, clipped by kv_len
    hi = jnp.minimum(jnp.max(pos_q) + 1, kv_len)
    n_blocks = pl.cdiv(hi, block_kv)

    def k_dma(slot, blk):
        return pltpu.make_async_copy(
            k_hbm.at[b, kh, pl.ds(blk * block_kv, block_kv), :], kbuf.at[slot], sems.at[slot, 0]
        )

    def v_dma(slot, blk):
        return pltpu.make_async_copy(
            v_hbm.at[b, kh, pl.ds(blk * block_kv, block_kv), :], vbuf.at[slot], sems.at[slot, 1]
        )

    if quant:
        # the whole scale row for (b, kh) is tiny ((NBLK, block_kv) bf16, ~3 KB at
        # T=1536) — one upfront DMA, then dynamic sublane slices per kv block
        ks_row = pltpu.make_async_copy(ks_hbm.at[b, kh], ksbuf, sems.at[0, 2])
        vs_row = pltpu.make_async_copy(vs_hbm.at[b, kh], vsbuf, sems.at[0, 3])
        ks_row.start()
        vs_row.start()
        ks_row.wait()
        vs_row.wait()

    def start_all(slot, blk):
        k_dma(slot, blk).start()
        v_dma(slot, blk).start()

    start_all(0, 0)

    def body(jj, carry):
        m, l, acc = carry
        slot = jj % 2

        @pl.when(jj + 1 < n_blocks)
        def _():
            start_all((jj + 1) % 2, jj + 1)

        k_dma(slot, jj).wait()
        v_dma(slot, jj).wait()
        k = kbuf[slot].astype(jnp.float32)  # (block_kv, D)
        v = vbuf[slot].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q2, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G*block_q, block_kv)
        if quant:
            # per-token scales: fold k's into the logit columns (v's fold into p after
            # the l update below) — int8 values stream from HBM at half the bytes and
            # dequantize only in VMEM. Row jj is picked by mask-reduce: a dynamic
            # sublane slice at a traced offset needs 8-alignment Mosaic can't prove.
            blk_ids = jax.lax.broadcasted_iota(jnp.int32, ksbuf.shape, 0)
            ks_blk = jnp.sum(jnp.where(blk_ids == jj, ksbuf[...].astype(jnp.float32), 0.0),
                             axis=0, keepdims=True)  # (1, block_kv)
            logits = logits * ks_blk
        # mask in a (G, block_q, block_kv) view — a jnp.tile of pos_q by G lowers to an
        # unsupported 1D tpu.concatenate for larger G
        slot_ids = jj * block_kv + jax.lax.broadcasted_iota(jnp.int32, (1, 1, block_kv), 2)
        mask = (slot_ids <= pos_q[None, :, None]) & (slot_ids < kv_len)
        logits = jnp.where(mask, logits.reshape(G, block_q, block_kv), NEG_INF).reshape(
            G * block_q, block_kv
        )
        m_blk = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quant:
            vs_blk = jnp.sum(jnp.where(blk_ids == jj, vsbuf[...].astype(jnp.float32), 0.0),
                             axis=0, keepdims=True)
            pv = p * vs_blk
        else:
            pv = p
        acc_new = acc * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((G * block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G * block_q, 1), jnp.float32)
    acc0 = jnp.zeros((G * block_q, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    out = (acc / jnp.maximum(l, 1e-30)).reshape(G, block_q, D).transpose(1, 0, 2)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv", "interpret"))
def flash_causal_attention(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,  # (B, Hkv, T, D) kv-head-major (cache layout)
    v: jnp.ndarray,
    positions: jnp.ndarray,  # (B, S) int32 query positions (== kv slot of each query)
    kv_len: jnp.ndarray,  # (B,) valid kv entries
    ks=None,  # (B, Hkv, T) per-token scales -> k/v are int8 (KVCache int8 mode)
    vs=None,
    *,
    block_q: int = 256,
    block_kv: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal GQA flash attention; exact. Returns (B, S, H, D) in q.dtype.

    Requires positions non-decreasing per row (true for prefill: slot==index) so the
    per-q-block causal bound is the block's max position. With ks/vs, k/v hold int8
    per-token-quantized values; the kernel streams them at half the HBM bytes and
    applies the scales to logits columns / p rows (exact algebra, decode_attention_q8
    semantics)."""
    B, S, H, D = q.shape
    Hkv = k.shape[1]
    T = k.shape[2]
    G = H // Hkv
    scale = D**-0.5
    quant = ks is not None
    Dp = max(128, -(-D // 128) * 128)
    if Dp != D:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, 0), (0, Dp - D)])
        k = jnp.pad(k, [(0, 0), (0, 0), (0, 0), (0, Dp - D)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, 0), (0, Dp - D)])
    pad_s = (-S) % block_q
    Sp = S + pad_s
    if pad_s:
        q = jnp.pad(q, [(0, 0), (0, pad_s), (0, 0), (0, 0)])
        positions = jnp.pad(positions, [(0, 0), (0, pad_s)], constant_values=0)
    pad_t = (-T) % block_kv
    Tp = T + pad_t
    if pad_t:
        k = jnp.pad(k, [(0, 0), (0, 0), (0, pad_t), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, pad_t), (0, 0)])
        if quant:
            ks = jnp.pad(ks, [(0, 0), (0, 0), (0, pad_t)])
            vs = jnp.pad(vs, [(0, 0), (0, 0), (0, pad_t)])
    n_blk = -(-(Tp // block_kv) // 8) * 8  # sublane-aligned row count for the DMA
    if quant:
        pad_blk = n_blk * block_kv - Tp
        ks2 = jnp.pad(ks.astype(jnp.bfloat16), [(0, 0), (0, 0), (0, pad_blk)]).reshape(B, Hkv, n_blk, block_kv)
        vs2 = jnp.pad(vs.astype(jnp.bfloat16), [(0, 0), (0, 0), (0, pad_blk)]).reshape(B, Hkv, n_blk, block_kv)
    else:  # minimal dummies: the quant branch is compiled out, inputs must just exist
        ks2 = jnp.zeros((1, 1, 8, block_kv), jnp.bfloat16)
        vs2 = ks2

    # q regrouped: (B, Sp, Hkv, G, D) -> block over Sp with G folded in-kernel
    qg = q.reshape(B, Sp, Hkv, G, Dp)
    n_q = Sp // block_q

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, Hkv, n_q),
        in_specs=[
            pl.BlockSpec((None, block_q, None, G, Dp), lambda b, h, i: (b, i, h, 0, 0), memory_space=pltpu.VMEM),  # q
            # per-q-block positions slice (an in-kernel dynamic lane-offset slice of the
            # full row is "outside the first tile" for Mosaic at n_q > 1)
            pl.BlockSpec((None, 1, block_q), lambda b, h, i: (b, 0, i), memory_space=pltpu.VMEM),  # positions
            # whole (B, 1) array in SMEM (a per-row squeezed block trips the TPU
            # block-shape divisibility rule at larger B); indexed by program id
            pl.BlockSpec((B, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),  # kv_len
            pl.BlockSpec(memory_space=pl.ANY),  # k
            pl.BlockSpec(memory_space=pl.ANY),  # v
            pl.BlockSpec(memory_space=pl.ANY),  # ks (flattened) or dummy
            pl.BlockSpec(memory_space=pl.ANY),  # vs
        ],
        out_specs=pl.BlockSpec(
            (None, block_q, None, G, Dp), lambda b, h, i: (b, i, h, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_kv, Dp), k.dtype),
            pltpu.VMEM((2, block_kv, Dp), v.dtype),
            pltpu.VMEM((n_blk, block_kv), jnp.bfloat16),  # full per-(b,kh) scale rows
            pltpu.VMEM((n_blk, block_kv), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_q=block_q, block_kv=block_kv, scale=scale, G=G, D=Dp, quant=quant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Sp, Hkv, G, Dp), q.dtype),
        interpret=interpret,
    )(qg, positions.reshape(B, 1, Sp).astype(jnp.int32), kv_len.reshape(B, 1).astype(jnp.int32), k, v, ks2, vs2)
    out = out.reshape(B, Sp, H, Dp)
    return out[:, :S, :, :D]
