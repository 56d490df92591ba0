"""Paged decode attention: Pallas kernel (interpret) vs gather oracle vs contiguous."""

import numpy as np
import pytest

import jax.numpy as jnp

from zoomearth_tpu.ops.attention import decode_attention
from zoomearth_tpu.ops.paged_attention import (
    append_to_pages,
    paged_decode_attention,
    paged_decode_attention_reference,
)

PAGE = 16


def _setup(B=3, H=4, Hkv=2, D=32, max_pages=5, seed=0):
    rng = np.random.default_rng(seed)
    P = B * max_pages + 2
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    kpool = rng.standard_normal((P, Hkv, PAGE, D)).astype(np.float32)
    vpool = rng.standard_normal((P, Hkv, PAGE, D)).astype(np.float32)
    # disjoint, shuffled page assignment
    ids = rng.permutation(P)[: B * max_pages].reshape(B, max_pages).astype(np.int32)
    lengths = np.array([PAGE * 2 + 3, 1, PAGE * 5], np.int32)  # partial, tiny, full
    return q, kpool, vpool, ids, lengths


def test_kernel_matches_gather_oracle():
    q, kpool, vpool, bt, lengths = _setup()
    want = paged_decode_attention_reference(
        jnp.asarray(q), jnp.asarray(kpool), jnp.asarray(vpool),
        jnp.asarray(bt), jnp.asarray(lengths), page_size=PAGE,
    )
    got = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kpool), jnp.asarray(vpool),
        jnp.asarray(bt), jnp.asarray(lengths), page_size=PAGE, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_oracle_matches_contiguous():
    """Pages laid out in order == slot-contiguous decode attention."""
    B, H, Hkv, D, max_pages = 2, 4, 2, 32, 4
    rng = np.random.default_rng(1)
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    T = max_pages * PAGE
    k = rng.standard_normal((B, Hkv, T, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, T, D)).astype(np.float32)
    lengths = np.array([T - 5, 7], np.int32)
    # pack the contiguous cache into pages row-major
    kpool = np.zeros((B * max_pages, Hkv, PAGE, D), np.float32)
    vpool = np.zeros_like(kpool)
    bt = np.arange(B * max_pages, dtype=np.int32).reshape(B, max_pages)
    for b in range(B):
        for p in range(max_pages):
            kpool[bt[b, p]] = k[b, :, p * PAGE:(p + 1) * PAGE].transpose(0, 1, 2)[
                :, :, :].reshape(Hkv, PAGE, D)
            vpool[bt[b, p]] = v[b, :, p * PAGE:(p + 1) * PAGE].reshape(Hkv, PAGE, D)
    want = decode_attention(jnp.asarray(q[:, None]), jnp.asarray(k), jnp.asarray(v),
                            kv_len=jnp.asarray(lengths))[:, 0]
    got = paged_decode_attention_reference(
        jnp.asarray(q), jnp.asarray(kpool), jnp.asarray(vpool),
        jnp.asarray(bt), jnp.asarray(lengths), page_size=PAGE,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_append_then_attend():
    """append_to_pages writes the new token where attention then reads it."""
    q, kpool, vpool, bt, lengths = _setup(seed=2)
    B, Hkv, D = q.shape[0], kpool.shape[1], q.shape[2]
    rng = np.random.default_rng(3)
    k_new = rng.standard_normal((B, Hkv, D)).astype(np.float32)
    v_new = rng.standard_normal((B, Hkv, D)).astype(np.float32)
    lengths = np.array([PAGE * 2 + 3, 1, PAGE * 4], np.int32)  # room in the last page
    kp2, vp2 = append_to_pages(
        jnp.asarray(kpool), jnp.asarray(vpool), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(bt), jnp.asarray(lengths), page_size=PAGE,
    )
    out = paged_decode_attention_reference(
        jnp.asarray(q), kp2, vp2, jnp.asarray(bt), jnp.asarray(lengths + 1), page_size=PAGE,
    )
    # oracle: manually place the new kv in a gathered contiguous cache
    max_pages = bt.shape[1]
    k = np.asarray(jnp.asarray(kpool)[bt]).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, -1, D)
    v = np.asarray(jnp.asarray(vpool)[bt]).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, -1, D)
    for b in range(B):
        k[b, :, lengths[b]] = k_new[b]
        v[b, :, lengths[b]] = v_new[b]
    want = decode_attention(jnp.asarray(q[:, None]), jnp.asarray(k), jnp.asarray(v),
                            kv_len=jnp.asarray(lengths + 1))[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_append_at_capacity_is_dropped():
    """A row at full capacity (lengths == max_pages*page_size) must not corrupt any
    page: the block-table gather is masked before indexing (it would otherwise clamp
    to the last page and overwrite its slot 0)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    P, Hkv, page, D, B, max_pages = 6, 2, 8, 16, 2, 2
    kpool = jnp.asarray(rng.standard_normal((P, Hkv, page, D)), jnp.float32)
    vpool = jnp.asarray(rng.standard_normal((P, Hkv, page, D)), jnp.float32)
    bt = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    k_new = jnp.ones((B, Hkv, D), jnp.float32)
    v_new = jnp.ones((B, Hkv, D), jnp.float32)
    lengths = jnp.asarray([max_pages * page, 3], jnp.int32)  # row 0 FULL, row 1 normal
    kp2, vp2 = append_to_pages(kpool, vpool, k_new, v_new, bt, lengths, page_size=page)
    # row 0's pages (0 and 1) untouched
    np.testing.assert_array_equal(np.asarray(kp2[:2]), np.asarray(kpool[:2]))
    np.testing.assert_array_equal(np.asarray(vp2[:2]), np.asarray(vpool[:2]))
    # row 1 wrote at page 2 (pos 3 // 8 = 0 -> bt[1,0]=2), slot 3
    np.testing.assert_array_equal(np.asarray(kp2[2, :, 3]), np.ones((Hkv, D)))
