"""Numerical parity tests: our JAX Qwen2.5-VL vs HF transformers (torch CPU, fp32).

A tiny random-init HF model is the oracle; its state_dict is converted with
params.convert_hf_state_dict, then ViT outputs, M-RoPE position ids, and full-forward
logits must match within fp32 tolerance.
"""

import numpy as np
import pytest

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models import params as P
from zoomearth_tpu.models import rope as R
from zoomearth_tpu.models.vit import vision_metadata, vit_forward
from zoomearth_tpu.models.vlm import vision_meta_to_device, vlm_forward

CFG = VLMConfig.tiny()


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import Qwen2_5_VLForConditionalGeneration
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLConfig

    t, v, tok = CFG.text, CFG.vision, CFG.tokens
    vision_config = dict(
        depth=v.depth,
        hidden_size=v.hidden_size,
        intermediate_size=v.intermediate_size,
        num_heads=v.num_heads,
        in_channels=v.in_channels,
        patch_size=v.patch_size,
        temporal_patch_size=v.temporal_patch_size,
        spatial_merge_size=v.spatial_merge_size,
        window_size=v.window_size,
        fullatt_block_indexes=list(v.fullatt_block_indexes),
        out_hidden_size=v.out_hidden_size,
        hidden_act="silu",
    )
    kwargs = dict(
        vocab_size=t.vocab_size,
        hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        num_key_value_heads=t.num_key_value_heads,
        rope_theta=t.rope_theta,
        rms_norm_eps=t.rms_norm_eps,
        tie_word_embeddings=t.tie_word_embeddings,
        max_position_embeddings=t.max_position_embeddings,
        rope_scaling={"type": "mrope", "mrope_section": list(t.mrope_section)},
        image_token_id=tok.image_pad,
        video_token_id=tok.video_pad,
        vision_start_token_id=tok.vision_start,
        vision_end_token_id=tok.vision_end,
        bos_token_id=tok.im_start,
        eos_token_id=tok.eos,
        pad_token_id=tok.pad,
        attn_implementation="eager",
    )
    hf_cfg = Qwen2_5_VLConfig(vision_config=vision_config, **kwargs)
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def jax_params(hf_model):
    return P.convert_hf_state_dict(hf_model.state_dict(), CFG, dtype="float32")


def _rand_pixels(grid_thw, seed=0):
    rng = np.random.default_rng(seed)
    n = sum(t * h * w for t, h, w in grid_thw)
    return rng.standard_normal((n, CFG.vision.patch_dim)).astype(np.float32)


@pytest.mark.parametrize("grids", [[(1, 4, 4)], [(1, 6, 8)], [(1, 4, 4), (1, 2, 6)]])
def test_vit_parity(hf_model, jax_params, grids):
    import torch

    pv = _rand_pixels(grids)
    with torch.no_grad():
        ref = hf_model.model.visual(
            torch.from_numpy(pv), grid_thw=torch.tensor(grids, dtype=torch.long)
        ).numpy()
    meta = vision_metadata(grids, CFG.vision)
    out = vit_forward(
        jax_params["vision"], CFG.vision, pv,
        meta.perm, meta.inv_perm_merged, meta.seg_window, meta.seg_full, meta.pos_ids,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


def test_vit_parity_with_padding(hf_model, jax_params):
    """Bucketed (padded) ViT input must produce identical real-token outputs."""
    import torch

    grids = [(1, 4, 4)]
    pv = _rand_pixels(grids)
    with torch.no_grad():
        ref = hf_model.model.visual(
            torch.from_numpy(pv), grid_thw=torch.tensor(grids, dtype=torch.long)
        ).numpy()
    pad_to = 32
    meta = vision_metadata(grids, CFG.vision, pad_to=pad_to)
    pv_pad = np.concatenate([pv, np.zeros((pad_to - pv.shape[0], pv.shape[1]), np.float32)])
    out = vit_forward(
        jax_params["vision"], CFG.vision, pv_pad,
        meta.perm, meta.inv_perm_merged, meta.seg_window, meta.seg_full, meta.pos_ids,
    )
    # output is BUCKET-sized (shape depends only on pad_to, never the image mix —
    # downstream programs stay compile-stable); real merged tokens lead, pads trail
    assert out.shape[0] == pad_to // CFG.vision.merge_unit
    np.testing.assert_allclose(np.asarray(out)[: ref.shape[0]], ref, atol=3e-5, rtol=1e-4)


def _make_sequence(grids, text_before=5, text_after=7, seed=1):
    """Token sequence: text, then per image [vision_start, pads..., vision_end], then text."""
    rng = np.random.default_rng(seed)
    tok = CFG.tokens
    ids = list(rng.integers(1, 400, size=text_before))
    for g in grids:
        n = (g[0] * g[1] * g[2]) // CFG.vision.merge_unit
        ids += [tok.vision_start] + [tok.image_pad] * n + [tok.vision_end]
    ids += list(rng.integers(1, 400, size=text_after))
    return np.asarray(ids, dtype=np.int64)


@pytest.mark.parametrize("grids", [[(1, 4, 4)], [(1, 4, 4), (1, 2, 6)]])
def test_mrope_position_ids_parity(hf_model, grids):
    import torch

    ids = _make_sequence(grids)
    ref_pos, ref_delta = hf_model.model.get_rope_index(
        torch.from_numpy(ids[None]),
        image_grid_thw=torch.tensor(grids, dtype=torch.long),
        attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
    )
    pos, nxt = R.mrope_position_ids(ids, grids, image_pad_id=CFG.tokens.image_pad)
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert nxt == int(ref_pos.max()) + 1


def test_mrope_position_ids_left_padding(hf_model):
    import torch

    grids = [(1, 4, 4)]
    ids = _make_sequence(grids)
    pad = 3
    padded = np.concatenate([np.full(pad, CFG.tokens.pad), ids])
    mask = np.concatenate([np.zeros(pad), np.ones(len(ids))]).astype(np.int64)
    ref_pos, _ = hf_model.model.get_rope_index(
        torch.from_numpy(padded[None]),
        image_grid_thw=torch.tensor(grids, dtype=torch.long),
        attention_mask=torch.from_numpy(mask[None]),
    )
    pos, _ = R.mrope_position_ids(
        padded, grids, image_pad_id=CFG.tokens.image_pad, attention_mask=mask
    )
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())


def test_full_forward_logits_parity(hf_model, jax_params):
    import torch

    grids = [(1, 4, 4)]
    ids = _make_sequence(grids)
    pv = _rand_pixels(grids)
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.from_numpy(ids[None]),
            pixel_values=torch.from_numpy(pv),
            image_grid_thw=torch.tensor(grids, dtype=torch.long),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
        ).logits.numpy()

    pos, _ = R.mrope_position_ids(ids, grids, image_pad_id=CFG.tokens.image_pad)
    meta = vision_metadata(grids, CFG.vision)
    logits, _ = vlm_forward(
        jax_params, CFG,
        input_ids=np.asarray(ids[None]),
        position_ids=pos[:, None, :],
        pixel_values=pv,
        vision_meta=vision_meta_to_device(meta),
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-5, rtol=1e-4)


def test_text_only_forward_parity(hf_model, jax_params):
    import torch

    rng = np.random.default_rng(3)
    ids = rng.integers(1, 400, size=(2, 9))
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones((2, 9), dtype=torch.long),
        ).logits.numpy()
    pos, _ = R.mrope_position_ids_batch(ids, [[], []], image_pad_id=CFG.tokens.image_pad)
    logits, _ = vlm_forward(jax_params, CFG, input_ids=ids, position_ids=pos)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-5, rtol=1e-4)
