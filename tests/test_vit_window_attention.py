"""Dense ViT windowed attention (window_block_attention / gather_window_attention)
vs the segment-mask reference.

The windowed ViT blocks' segments (window_index, models/vit.py) are contiguous,
ascending, and span <= 64 patches — the dense paths exploit that with batched matmuls
instead of the flash segment kernel (reference varlen flash-attn,
qwen2_5vl_monkey_patch.py:35). These tests pin:
- numerical equality with the masked-softmax reference on uniform and edge-window
  segment layouts (incl. a PAD tail),
- the host-side win_mode classification + gather plan in vision_metadata,
- vit_forward end-to-end equality across win_mode 0/1/2.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zoomearth_tpu.ops.attention import (
    LOCAL_BLOCK, gather_window_attention, segment_attention, window_block_attention,
)
from zoomearth_tpu.ops.flash_attention import PAD_SEG
from zoomearth_tpu.models.vit import _window_gather_plan


def _rand_qkv(rng, S, H=4, D=32):
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    return q, k, v


def _gather(q, k, v, seg_np):
    plan = _window_gather_plan(np.asarray(seg_np), LOCAL_BLOCK)
    assert plan is not None
    gidx, valid, sidx = plan
    return gather_window_attention(
        q, k, v, jnp.asarray(gidx), jnp.asarray(valid), jnp.asarray(sidx)
    )


def test_uniform_windows_match_reference():
    rng = np.random.default_rng(0)
    S = 4 * LOCAL_BLOCK
    q, k, v = _rand_qkv(rng, S)
    seg = jnp.asarray(np.repeat(np.arange(4), LOCAL_BLOCK), jnp.int32)
    ref = segment_attention(q, k, v, seg)
    out = window_block_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_edge_windows_match_reference():
    """Variable window sizes <= 64 straddling block boundaries (resized stage-1
    images: e.g. an 18x18 merged grid pads to 5x5 windows of 64/32/16 patches)."""
    rng = np.random.default_rng(1)
    sizes = [64, 10, 54, 30, 34, 64]  # sum = 256, several straddle 64-row edges
    S = sum(sizes)
    assert S % LOCAL_BLOCK == 0
    q, k, v = _rand_qkv(rng, S)
    seg_np = np.repeat(np.arange(len(sizes)), sizes).astype(np.int32)
    ref = segment_attention(q, k, v, jnp.asarray(seg_np))
    out = _gather(q, k, v, seg_np)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pad_tail_real_rows_unaffected():
    """A bucket PAD tail (PAD_SEG) spans many 64-row pseudo-windows; real-row outputs
    must match the reference exactly (pad rows are garbage by contract in both impls)."""
    rng = np.random.default_rng(2)
    sizes = [64, 40, 24]  # 128 real rows
    n_real = sum(sizes)
    S = n_real + 2 * LOCAL_BLOCK
    q, k, v = _rand_qkv(rng, S)
    seg_np = np.concatenate([np.repeat(np.arange(len(sizes)), sizes),
                             np.full(S - n_real, PAD_SEG)]).astype(np.int32)
    ref = segment_attention(q, k, v, jnp.asarray(seg_np))
    out = _gather(q, k, v, seg_np)
    np.testing.assert_allclose(
        np.asarray(out)[:n_real], np.asarray(ref)[:n_real], atol=2e-5
    )


def test_gather_plan_structure():
    """Plan invariants: every real row round-trips through exactly one valid slot;
    degenerate (expansion > 2x) layouts return None and stay on the flash kernel."""
    sizes = [64, 10, 54, 30, 34, 64]
    seg = np.repeat(np.arange(len(sizes)), sizes).astype(np.int32)
    gidx, valid, sidx = _window_gather_plan(seg, LOCAL_BLOCK)
    S = len(seg)
    assert valid.sum() == S
    assert valid.reshape(-1)[sidx].all()  # every real row lands on a valid slot
    # scatter(gather(row_index)) == row_index: the round trip is the identity
    np.testing.assert_array_equal(gidx[sidx], np.arange(S))
    # 4-row windows would gather to 16x the rows: plan refuses
    tiny = np.repeat(np.arange(64), 4).astype(np.int32)
    assert _window_gather_plan(tiny, LOCAL_BLOCK) is None


def test_vision_metadata_win_mode_classification():
    from zoomearth_tpu.config import VLMConfig
    from zoomearth_tpu.models.vit import vision_metadata

    vcfg = VLMConfig.qwen2_5_vl_3b().vision
    # 512px crop: 32x32 grid -> 16x16 merged -> all windows full 4x4 merged (64
    # patches), aligned -> uniform
    m2 = vision_metadata([(1, 32, 32)], vcfg)
    assert m2.win_mode == 2 and m2.win_gidx is None
    # resized 504px tile: 36x36 -> 18x18 merged -> 5x5 windows with 2-wide edges
    m = vision_metadata([(1, 36, 36)], vcfg, pad_to=1536)
    assert m.win_mode == 1
    assert m.win_gidx is not None and m.win_valid.shape[1] == LOCAL_BLOCK
    assert m.win_sidx.shape == (1536,)
    # window-free family (Qwen2-VL: fullatt covers all blocks): segments are whole
    # images (span >> 64) -> must stay on the segment kernel
    import dataclasses

    v2 = dataclasses.replace(vcfg, fullatt_block_indexes=tuple(range(vcfg.depth)))
    assert vision_metadata([(1, 32, 32)], v2).win_mode == 0


@pytest.mark.parametrize("grids,expect_mode", [
    ([(1, 16, 16)] * 2, 2),   # uniform windows
    ([(1, 12, 20)] * 2, 1),   # merged 6x10 -> pad to 8x12 -> edge windows
])
def test_vit_forward_win_modes_agree(grids, expect_mode):
    """End-to-end ViT: the dense windowed paths must reproduce the flash/XLA segment
    path bit-for-bit within fp32 tolerance on real metadata (perm, pads, merger)."""
    import dataclasses

    from zoomearth_tpu.config import VLMConfig
    from zoomearth_tpu.models.params import init_vision_params
    from zoomearth_tpu.models.vit import vision_metadata, vit_forward

    vcfg = dataclasses.replace(
        VLMConfig.qwen2_5_vl_3b().vision,
        depth=2, hidden_size=64, intermediate_size=128, num_heads=2,
        out_hidden_size=32, fullatt_block_indexes=(1,),
    )
    n_patches = sum(t * h * w for t, h, w in grids)
    pad_to = -(-n_patches // 256) * 256
    meta = vision_metadata(grids, vcfg, pad_to=pad_to)
    assert meta.win_mode == expect_mode
    rng = np.random.default_rng(3)
    pv = jnp.asarray(rng.standard_normal((pad_to, vcfg.patch_dim)), jnp.float32)
    params = init_vision_params(jax.random.key(0), vcfg, dtype=jnp.float32)
    args = (params, vcfg, pv, jnp.asarray(meta.perm), jnp.asarray(meta.inv_perm_merged),
            jnp.asarray(meta.seg_window), jnp.asarray(meta.seg_full),
            jnp.asarray(meta.pos_ids))
    plan = None
    if meta.win_gidx is not None:
        plan = (jnp.asarray(meta.win_gidx), jnp.asarray(meta.win_valid),
                jnp.asarray(meta.win_sidx))
    ref = vit_forward(*args, win_mode=0)
    out = vit_forward(*args, win_mode=meta.win_mode, win_plan=plan)
    n_real = meta.num_patches // vcfg.merge_unit
    np.testing.assert_allclose(
        np.asarray(out)[:n_real], np.asarray(ref)[:n_real], atol=3e-5
    )
