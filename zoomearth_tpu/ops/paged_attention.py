"""Paged KV decode attention (vLLM paged-attention equivalent, Pallas TPU).

The north-star serving design point (BASELINE.json: "paged KV cache"): KV lives in a
pool of fixed-size pages; each sequence owns a per-slot block table of page ids, so
HBM scales with LIVE tokens and admission is incremental. This module provides:

- `paged_decode_attention`: Pallas kernel — one program per (sequence, kv-head) walks
  that row's block table (scalar-prefetched), double-buffers page DMAs from HBM, and
  runs online-softmax GQA attention over exactly ceil(len/page) pages. Unlike the
  slot-contiguous path (ops/attention.decode_attention reads all T slots and masks),
  it never touches unused cache.
- `paged_decode_attention_reference`: XLA gather-based oracle for tests.
- `append_to_pages`: scatter one decode step's new kv into the pools.

Measured verdict (PARITY.md "Paged KV measurement"): page size decides everything.
At 64-token pages the kernel is DMA-latency-bound and loses ~2.4x; at 256-token pages
it TIES slot-contiguous at (B=32, T=4096, 30% live) and WINS at (B=64, T=4096, 30%
live: 13.08 vs 13.52 ms/36-layer step) while allocating HBM proportional to LIVE
tokens (3.3x less at 30% occupancy — the B=64/T=4096 contiguous cache, 9.7 GB, does
not even fit next to the int8 params). Default page_size is therefore 256. The
ZoomEarth serving operating point (<=2k ctx, dense slots) stays slot-contiguous;
paged-256 is the designated long-context/high-slot configuration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(bt_ref, npages_ref, q_ref, kpool, vpool, o_ref, kbuf, vbuf, sems, *, page_size, scale):
    b = pl.program_id(0)
    h = pl.program_id(1)
    n = npages_ref[b]

    q = q_ref[...].astype(jnp.float32) * scale  # (G, D)
    G, D = q.shape

    def k_dma(slot, i):
        pid = bt_ref[b, i]
        return pltpu.make_async_copy(kpool.at[pid, h], kbuf.at[slot], sems.at[slot, 0])

    def v_dma(slot, i):
        pid = bt_ref[b, i]
        return pltpu.make_async_copy(vpool.at[pid, h], vbuf.at[slot], sems.at[slot, 1])

    @pl.when(n > 0)
    def _():
        k_dma(0, 0).start()
        v_dma(0, 0).start()

    def body(i, carry):
        m, l, acc = carry
        slot = i % 2

        @pl.when(i + 1 < n)
        def _():
            k_dma((i + 1) % 2, i + 1).start()
            v_dma((i + 1) % 2, i + 1).start()

        k_dma(slot, i).wait()
        v_dma(slot, i).wait()
        k = kbuf[slot].astype(jnp.float32)  # (page, D)
        v = vbuf[slot].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G, page)
        # mask the final page's tail beyond the row's length
        pos = i * page_size + jax.lax.broadcasted_iota(jnp.int32, (1, page_size), 1)
        logits = jnp.where(pos < npages_ref[pl.num_programs(0) + b], logits, NEG_INF)
        m_blk = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G, 1), jnp.float32)
    acc0 = jnp.zeros((G, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n, body, (m0, l0, acc0))
    o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("page_size", "interpret"))
def paged_decode_attention(
    q: jnp.ndarray,  # (B, H, D) single decode step
    kpool: jnp.ndarray,  # (P, Hkv, page_size, D)
    vpool: jnp.ndarray,
    block_table: jnp.ndarray,  # (B, max_pages) int32 page ids (unused entries arbitrary)
    lengths: jnp.ndarray,  # (B,) valid kv tokens per row
    *,
    page_size: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """GQA decode attention over paged KV. Returns (B, H, D) in q.dtype."""
    B, H, D = q.shape
    Hkv = kpool.shape[1]
    G = H // Hkv
    scale = D**-0.5
    n_pages = (lengths + page_size - 1) // page_size  # (B,)
    # scalar-prefetch arrays: per-row page count AND lengths (packed one array)
    counts_and_lens = jnp.concatenate([n_pages.astype(jnp.int32), lengths.astype(jnp.int32)])

    qg = q.reshape(B, Hkv, G, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_table, counts_and_lens
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec((None, None, G, D), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # kpool (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # vpool
        ],
        out_specs=pl.BlockSpec((None, None, G, D), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, page_size, D), kpool.dtype),
            pltpu.VMEM((2, page_size, D), vpool.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, page_size=page_size, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )(block_table.astype(jnp.int32), counts_and_lens, qg, kpool, vpool)
    return out.reshape(B, H, D)


def paged_decode_attention_reference(q, kpool, vpool, block_table, lengths, *, page_size=256):
    """XLA oracle: gather pages into contiguous kv then run the masked GQA softmax."""
    from .attention import decode_attention

    B, H, D = q.shape
    Hkv = kpool.shape[1]
    max_pages = block_table.shape[1]
    # (B, max_pages, Hkv, page, D) -> (B, Hkv, max_pages*page, D)
    k = kpool[block_table]  # (B, max_pages, Hkv, page, D)
    v = vpool[block_table]
    k = k.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, max_pages * page_size, D)
    v = v.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, max_pages * page_size, D)
    return decode_attention(q[:, None], k, v, kv_len=lengths)[:, 0]


def append_to_pages(kpool, vpool, k_new, v_new, block_table, lengths, *, page_size=256):
    """Scatter one decode step's kv (B, Hkv, D) into the pools at each row's position.

    Returns (kpool, vpool). Position = lengths[b]; page = block_table[b, pos // ps].
    Rows already at capacity (lengths[b] == max_pages*page_size) DROP the write: the
    block-table gather is masked BEFORE indexing (an unmasked gather would clamp to the
    last page and silently overwrite its slot 0 — drop mode only guards the scatter)."""
    B = k_new.shape[0]
    max_pages = block_table.shape[1]
    pos = lengths  # (B,)
    in_range = pos < max_pages * page_size
    page_slot = jnp.where(in_range, pos // page_size, 0)
    page_idx = jnp.where(
        in_range, block_table[jnp.arange(B), page_slot], kpool.shape[0]
    )  # out-of-range page id -> drop-mode scatter discards the row
    slot_in_page = pos % page_size  # (B,)
    kpool = kpool.at[page_idx, :, slot_in_page, :].set(k_new, mode="drop")
    vpool = vpool.at[page_idx, :, slot_in_page, :].set(v_new, mode="drop")
    return kpool, vpool
