"""Pallas TPU flash attention for packed varlen (segment-id) sequences.

The ViT's hot kernel (SURVEY.md §2.4: the reference leans on flash_attn_varlen_func
CUDA, qwen2_5vl_monkey_patch.py:35; here the cu_seqlens semantics become segment ids).
Online-softmax tiling so the (S, S) logits matrix is never materialized — the XLA
reference path needs H*S²*4 bytes (27 GB at S=20k), this needs O(block² ) VMEM.

Key structural optimization: segment ids are ASCENDING in the packed layout (windows
are emitted in order; images concatenated in order), so each query block only overlaps
a contiguous kv range. Those ranges are computed with two searchsorteds in the wrapper
and passed as scalar-prefetch arrays; the kernel double-buffers k/v block DMAs from HBM
over exactly [start, end) — windowed blocks touch ~1 kv block instead of all S/bkv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Segment id used for padding rows. Must sort AFTER all real ids (ascending layout).
PAD_SEG = 2**30


def _kernel(starts_ref, ends_ref, seg_ref, q_ref, k_hbm, v_hbm, o_ref, kbuf, vbuf, sems, *, block_q, block_kv, scale):
    h = pl.program_id(0)
    qi = pl.program_id(1)
    start_blk = starts_ref[qi]
    n_blocks = ends_ref[qi] - start_blk

    q = q_ref[...].astype(jnp.float32) * scale  # (bq, D)
    seg_q = seg_ref[0, pl.ds(qi * block_q, block_q)]  # (bq,)
    D = q.shape[-1]

    def k_dma(slot, blk):
        return pltpu.make_async_copy(
            k_hbm.at[h, pl.ds(blk * block_kv, block_kv), :], kbuf.at[slot], sems.at[slot, 0]
        )

    def v_dma(slot, blk):
        return pltpu.make_async_copy(
            v_hbm.at[h, pl.ds(blk * block_kv, block_kv), :], vbuf.at[slot], sems.at[slot, 1]
        )

    k_dma(0, start_blk).start()
    v_dma(0, start_blk).start()

    def body(jj, carry):
        m, l, acc = carry
        blk = start_blk + jj
        slot = jj % 2

        @pl.when(jj + 1 < n_blocks)
        def _():
            k_dma((jj + 1) % 2, blk + 1).start()
            v_dma((jj + 1) % 2, blk + 1).start()

        k_dma(slot, blk).wait()
        v_dma(slot, blk).wait()

        k = kbuf[slot].astype(jnp.float32)  # (bkv, D)
        v = vbuf[slot].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bkv)
        seg_k = seg_ref[0, pl.ds(blk * block_kv, block_kv)]
        mask = seg_q[:, None] == seg_k[None, :]
        logits = jnp.where(mask, logits, NEG_INF)

        m_blk = jnp.max(logits, axis=-1, keepdims=True)  # (bq, 1)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(logits - m_new)  # (bq, bkv)
        alpha = jnp.exp(m - m_new)  # (bq, 1)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv", "interpret"))
def flash_segment_attention(
    q: jnp.ndarray,  # (S, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    seg: jnp.ndarray,  # (S,) int32 ASCENDING segment ids (pads use PAD_SEG)
    *,
    block_q: int = 256,
    block_kv: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed varlen self-attention; exact (online softmax), block-skipping via the
    ascending-segment contiguity property. Returns (S, H, D) in q.dtype."""
    S, H, D = q.shape
    scale = D**-0.5
    # Mosaic DMA slices must be 128-aligned in the minor dim; the ViT head_dim is 80.
    # Zero-pad D to 128 (exact: zero q/k columns add nothing to logits, zero v columns
    # produce zero outputs that are sliced off) — free on the 128-wide MXU.
    Dp = max(128, -(-D // 128) * 128)
    if Dp != D:
        padD = [(0, 0), (0, 0), (0, Dp - D)]
        q = jnp.pad(q, padD)
        k = jnp.pad(k, padD)
        v = jnp.pad(v, padD)
    pad_s = (-S) % max(block_q, block_kv)
    Sp = S + pad_s
    if pad_s:
        zq = jnp.zeros((pad_s, H, Dp), q.dtype)
        q = jnp.concatenate([q, zq], 0)
        k = jnp.concatenate([k, zq], 0)
        v = jnp.concatenate([v, zq], 0)
        seg = jnp.concatenate([seg, jnp.full((pad_s,), PAD_SEG, seg.dtype)])

    n_q = Sp // block_q
    n_kv = Sp // block_kv
    # kv block range per q block (contiguous because seg is ascending)
    qb = seg.reshape(n_q, block_q)
    seg_lo = qb.min(axis=1)
    seg_hi = qb.max(axis=1)
    first = jnp.searchsorted(seg, seg_lo, side="left")
    last = jnp.searchsorted(seg, seg_hi, side="right")
    starts = (first // block_kv).astype(jnp.int32)
    ends = jnp.minimum(pl.cdiv(last, block_kv), n_kv).astype(jnp.int32)

    qT = q.transpose(1, 0, 2)  # (H, Sp, Dp)
    kT = k.transpose(1, 0, 2)
    vT = v.transpose(1, 0, 2)
    seg2d = seg.reshape(1, Sp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(H, n_q),
        in_specs=[
            pl.BlockSpec((1, Sp), lambda h, i, *_: (0, 0), memory_space=pltpu.VMEM),  # seg
            pl.BlockSpec((None, block_q, Dp), lambda h, i, *_: (h, i, 0), memory_space=pltpu.VMEM),  # q
            pl.BlockSpec(memory_space=pl.ANY),  # k (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # v
        ],
        out_specs=pl.BlockSpec((None, block_q, Dp), lambda h, i, *_: (h, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block_kv, Dp), k.dtype),
            pltpu.VMEM((2, block_kv, Dp), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_q=block_q, block_kv=block_kv, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, Sp, Dp), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * H * Sp * Sp * D // max(n_kv, 1),  # rough: block-sparse discount
            bytes_accessed=(3 * Sp * H * D + Sp * H * D) * q.dtype.itemsize,
            transcendentals=H * Sp * Sp // max(n_kv, 1),
        ),
    )(starts, ends, seg2d, qT, kT, vT)
    return out.transpose(1, 0, 2)[:S, :, :D]
