"""Causal GQA flash kernel (interpret mode) vs the XLA reference path."""

import numpy as np
import pytest

from zoomearth_tpu.ops.attention import causal_attention
from zoomearth_tpu.ops.flash_causal import flash_causal_attention


def _qkv(B, S, T, H, Hkv, D, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    return q, k, v


def _check(q, k, v, positions, kv_len, block_q=32, block_kv=32, atol=2e-5):
    import jax.numpy as jnp

    B, S = positions.shape
    T = k.shape[1]
    slot = np.broadcast_to(np.arange(T)[None], (B, T))
    valid = slot < kv_len[:, None]
    # causal_attention takes kv-head-major (cache-layout) k/v; the flash kernel takes
    # seq-major fresh projections
    ref = np.asarray(
        causal_attention(
            q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
            positions=positions, kv_positions=jnp.asarray(slot), valid=jnp.asarray(valid),
        )
    )
    out = np.asarray(
        flash_causal_attention(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                               positions, kv_len,
                               block_q=block_q, block_kv=block_kv, interpret=True)
    )
    # only rows whose position is within kv_len are meaningful
    for b in range(B):
        n = int(min(kv_len[b], S))
        np.testing.assert_allclose(out[b, :n], ref[b, :n], atol=atol, rtol=1e-4)


def test_self_attention_square():
    B, S, H, Hkv, D = 2, 64, 4, 2, 16
    q, k, v = _qkv(B, S, S, H, Hkv, D)
    positions = np.broadcast_to(np.arange(S)[None], (B, S)).copy()
    kv_len = np.array([S, S], np.int32)
    _check(q, k, v, positions, kv_len)


def test_mha_no_gqa():
    B, S, H, D = 1, 64, 4, 16
    q, k, v = _qkv(B, S, S, H, H, D, seed=1)
    positions = np.broadcast_to(np.arange(S)[None], (B, S)).copy()
    _check(q, k, v, positions, np.array([S], np.int32))


def test_chunk_prefill_into_cache():
    """Queries at positions offset into a longer kv cache (stage-2 continuation)."""
    B, S, T, H, Hkv, D = 2, 32, 128, 4, 2, 16
    q, k, v = _qkv(B, S, T, H, Hkv, D, seed=2)
    starts = np.array([40, 70], np.int32)
    positions = starts[:, None] + np.arange(S)[None]
    kv_len = starts + S
    _check(q, k, v, positions, kv_len)


def test_ragged_kv_len():
    B, S, T, H, Hkv, D = 2, 64, 64, 4, 2, 16
    q, k, v = _qkv(B, S, T, H, Hkv, D, seed=3)
    positions = np.broadcast_to(np.arange(S)[None], (B, S)).copy()
    kv_len = np.array([64, 40], np.int32)
    _check(q, k, v, positions, kv_len)


def test_non_block_multiple_s():
    B, S, H, Hkv, D = 1, 80, 4, 2, 16
    q, k, v = _qkv(B, S, S, H, Hkv, D, seed=4)
    positions = np.broadcast_to(np.arange(S)[None], (B, S)).copy()
    _check(q, k, v, positions, np.array([S], np.int32), block_q=32, block_kv=32)


def _quantize_per_token(x):
    """(B, Hkv, T, D) -> int8 values + (B, Hkv, T) scales, x ≈ int8 * scale."""
    amax = np.abs(x).max(axis=-1)
    scale = np.maximum(amax, 1e-6) / 127.0
    q = np.clip(np.round(x / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


@pytest.mark.parametrize("S,T,block_kv", [(64, 64, 32), (32, 200, 32)])
def test_int8_quant_branch_matches_dequantized(S, T, block_kv):
    """The quant branch (ks/vs scale streaming, sublane-aligned scale-row DMA,
    mask-reduce row selection) must be EXACT vs the XLA reference on the
    dequantized cache. T=200 is not divisible by 8*block_kv — exercises the
    n_blk scale-row padding."""
    import jax.numpy as jnp

    B, H, Hkv, D = 2, 4, 2, 16
    q, k, v = _qkv(B, S, T, H, Hkv, D, seed=7)
    kc = k.transpose(0, 2, 1, 3)  # (B, Hkv, T, D) cache layout
    vc = v.transpose(0, 2, 1, 3)
    k8, ks = _quantize_per_token(kc)
    v8, vs = _quantize_per_token(vc)
    # bf16 scales in the kernel: quantize the reference cache identically so the
    # comparison isolates the kernel algebra, not the scale rounding
    ks_b = ks.astype(jnp.bfloat16).astype(np.float32)
    vs_b = vs.astype(jnp.bfloat16).astype(np.float32)
    k_deq = k8.astype(np.float32) * ks_b[..., None]
    v_deq = v8.astype(np.float32) * vs_b[..., None]

    starts = np.array([T - S, T - S // 2], np.int32)
    positions = starts[:, None] + np.arange(S)[None]
    kv_len = np.minimum(starts + S, T).astype(np.int32)
    slot = np.broadcast_to(np.arange(T)[None], (B, T))
    valid = slot < kv_len[:, None]
    ref = np.asarray(
        causal_attention(
            q, k_deq, v_deq, positions=positions,
            kv_positions=jnp.asarray(slot), valid=jnp.asarray(valid),
        )
    )
    out = np.asarray(
        flash_causal_attention(
            q, jnp.asarray(k8), jnp.asarray(v8), positions, kv_len,
            ks=jnp.asarray(ks), vs=jnp.asarray(vs),
            block_q=32, block_kv=block_kv, interpret=True,
        )
    )
    for b in range(B):
        n = int(min(kv_len[b] - starts[b], S))
        np.testing.assert_allclose(out[b, :n], ref[b, :n], atol=3e-5, rtol=1e-4)
