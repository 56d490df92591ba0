"""Flash segment-attention kernel (interpret mode on CPU) vs the XLA reference."""

import numpy as np
import pytest

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.vit import vision_metadata
from zoomearth_tpu.ops.attention import segment_attention
from zoomearth_tpu.ops.flash_attention import PAD_SEG, flash_segment_attention

CFG = VLMConfig.tiny()


def _qkv(S, H=4, D=16, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((S, H, D)).astype(np.float32) for _ in range(3)]


def _check(q, k, v, seg, block_q, block_kv, atol=2e-5):
    ref = np.asarray(segment_attention(q, k, v, seg))
    out = np.asarray(
        flash_segment_attention(q, k, v, seg, block_q=block_q, block_kv=block_kv, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=atol, rtol=1e-4)


def test_single_segment_matches_dense():
    q, k, v = _qkv(64)
    seg = np.zeros(64, np.int32)
    _check(q, k, v, seg, 32, 32)


def test_window_segments_from_real_metadata():
    grids = [(1, 8, 8), (1, 4, 8)]
    meta = vision_metadata(grids, CFG.vision)
    S = meta.seg_window.shape[0]
    q, k, v = _qkv(S, H=2, D=8, seed=1)
    _check(q, k, v, meta.seg_window.astype(np.int32), 32, 32)


def test_full_attention_segments_multi_image():
    grids = [(1, 8, 8), (1, 4, 8)]
    meta = vision_metadata(grids, CFG.vision)
    S = meta.seg_full.shape[0]
    q, k, v = _qkv(S, H=2, D=8, seed=2)
    _check(q, k, v, meta.seg_full.astype(np.int32), 32, 64)


def test_padded_bucket():
    grids = [(1, 6, 6)]
    meta = vision_metadata(grids, CFG.vision, pad_to=64)
    q, k, v = _qkv(64, H=2, D=8, seed=3)
    out = np.asarray(
        flash_segment_attention(q, k, v, meta.seg_window.astype(np.int32),
                                block_q=32, block_kv=32, interpret=True)
    )
    ref = np.asarray(segment_attention(q, k, v, meta.seg_window.astype(np.int32)))
    # only real rows must match (pad rows are garbage by contract)
    np.testing.assert_allclose(out[:36], ref[:36], atol=2e-5, rtol=1e-4)


def test_non_multiple_length_padding_inside_kernel():
    """S not a multiple of the block size exercises the wrapper's internal padding."""
    S = 80
    q, k, v = _qkv(S, H=2, D=8, seed=4)
    seg = np.repeat(np.arange(5), 16).astype(np.int32)
    _check(q, k, v, seg, 32, 32)


def test_block_skipping_ranges():
    """Blocks outside a query block's segment range are provably skipped: poison kv
    rows of OTHER segments with NaN — the masked reference would still produce NaN*0
    contributions killed by where(), while the flash kernel must never touch them."""
    S = 128
    q, k, v = _qkv(S, H=1, D=8, seed=5)
    seg = np.repeat(np.arange(4), 32).astype(np.int32)
    # poison everything outside segment 0 in k/v
    k[32:] = np.nan
    v[32:] = np.nan
    out = np.asarray(
        flash_segment_attention(q, k, v, seg, block_q=32, block_kv=32, interpret=True)
    )
    assert np.isfinite(out[:32]).all()
