"""Qwen2-VL (non-2.5) family parity: LayerNorm + quick_gelu fc MLP + full attention.

The reference vendors this exact modeling file (open_r1/model/modeling_qwen2_vl.py);
our ViT supports it via config (norm_type=layer, mlp_type=gelu_fc, all-blocks full
attention). Oracle: HF transformers Qwen2VLForConditionalGeneration, tiny random init.
"""

import json

import numpy as np
import pytest

from zoomearth_tpu.config import SpecialTokens, TextConfig, VisionConfig, VLMConfig, databank_id
from zoomearth_tpu.models import params as P
from zoomearth_tpu.models import rope as R
from zoomearth_tpu.models.vit import vision_metadata, vit_forward
from zoomearth_tpu.models.vlm import vision_meta_to_device, vlm_forward

VOCAB = 512
DEPTH = 3
CFG = VLMConfig(
    vision=VisionConfig(
        depth=DEPTH, hidden_size=32, intermediate_size=128, num_heads=4,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
        window_size=10**9, fullatt_block_indexes=tuple(range(DEPTH)),
        out_hidden_size=64, hidden_act="quick_gelu", norm_type="layer", mlp_type="gelu_fc",
    ),
    text=TextConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        rope_theta=1000000.0, tie_word_embeddings=True, mrope_section=(2, 3, 3),
    ),
    tokens=SpecialTokens(
        image_pad=databank_id(VOCAB, 0), video_pad=databank_id(VOCAB, 1),
        vision_start=databank_id(VOCAB, 2), vision_end=databank_id(VOCAB, 3),
        im_start=databank_id(VOCAB, 4), im_end=databank_id(VOCAB, 5),
        endoftext=databank_id(VOCAB, 6), eos=databank_id(VOCAB, 5),
    ),
    dtype="float32",
)


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import Qwen2VLForConditionalGeneration
    from transformers.models.qwen2_vl.configuration_qwen2_vl import Qwen2VLConfig

    t, v, tok = CFG.text, CFG.vision, CFG.tokens
    hf_cfg = Qwen2VLConfig(
        vision_config=dict(
            depth=v.depth, embed_dim=v.hidden_size, mlp_ratio=v.intermediate_size // v.hidden_size,
            num_heads=v.num_heads, in_channels=v.in_channels, patch_size=v.patch_size,
            temporal_patch_size=v.temporal_patch_size, spatial_merge_size=v.spatial_merge_size,
            hidden_size=v.out_hidden_size, hidden_act="quick_gelu",
        ),
        vocab_size=t.vocab_size, hidden_size=t.hidden_size, intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_hidden_layers, num_attention_heads=t.num_attention_heads,
        num_key_value_heads=t.num_key_value_heads, rope_theta=t.rope_theta,
        rms_norm_eps=t.rms_norm_eps, tie_word_embeddings=t.tie_word_embeddings,
        rope_scaling={"type": "mrope", "mrope_section": list(t.mrope_section)},
        image_token_id=tok.image_pad, video_token_id=tok.video_pad,
        vision_start_token_id=tok.vision_start, vision_end_token_id=tok.vision_end,
        bos_token_id=tok.im_start, eos_token_id=tok.eos, pad_token_id=tok.pad,
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    return Qwen2VLForConditionalGeneration(hf_cfg).eval().float()


@pytest.fixture(scope="module")
def jax_params(hf_model):
    return P.convert_hf_state_dict(hf_model.state_dict(), CFG, dtype="float32")


def test_from_hf_dir_detects_qwen2_vl(tmp_path):
    cfg_json = {
        "model_type": "qwen2_vl", "vocab_size": 1000, "hidden_size": 96,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "vision_config": {"depth": 3, "embed_dim": 48, "mlp_ratio": 4, "num_heads": 4,
                          "hidden_size": 96},
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg_json))
    cfg = VLMConfig.from_hf_dir(str(tmp_path))
    assert cfg.vision.norm_type == "layer" and cfg.vision.mlp_type == "gelu_fc"
    assert cfg.vision.hidden_size == 48 and cfg.vision.intermediate_size == 192
    assert len(cfg.vision.fullatt_block_indexes) == 3
    assert cfg.vision.out_hidden_size == 96


@pytest.mark.parametrize("grids", [[(1, 4, 4)], [(1, 4, 4), (1, 2, 6)]])
def test_qwen2vl_vit_parity(hf_model, jax_params, grids):
    import torch

    rng = np.random.default_rng(1)
    n = sum(t * h * w for t, h, w in grids)
    pv = rng.standard_normal((n, CFG.vision.patch_dim)).astype(np.float32)
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


def test_qwen2vl_full_forward_parity(hf_model, jax_params):
    import torch

    grids = [(1, 4, 4)]
    rng = np.random.default_rng(2)
    tok = CFG.tokens
    n = 16 // CFG.vision.merge_unit
    ids = np.asarray(
        list(rng.integers(1, 400, size=4)) + [tok.vision_start] + [tok.image_pad] * n
        + [tok.vision_end] + list(rng.integers(1, 400, size=5)),
        dtype=np.int64,
    )
    pv = rng.standard_normal((16, CFG.vision.patch_dim)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.from_numpy(ids[None]),
            pixel_values=torch.from_numpy(pv),
            image_grid_thw=torch.tensor(grids, dtype=torch.long),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
        ).logits.numpy()
    pos, _ = R.mrope_position_ids(ids, grids, image_pad_id=tok.image_pad)
    meta = vision_metadata(grids, CFG.vision)
    logits, _ = vlm_forward(
        jax_params, CFG, ids[None], pos[:, None, :], pv, vision_meta_to_device(meta)
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-5, rtol=1e-4)
