"""Scale-credible parity: bf16 greedy TOKEN IDENTITY vs HF `generate` at a mid-size
random config (8 GQA decoder layers, 8-block windowed ViT), covering the two-stage
stitched prompt and the KV-reuse continuation (VERDICT r1 item 9; acceptance gate:
BASELINE.json "token-identical answers").

bf16 is the deployment dtype — this is where accumulation-order differences between
XLA and torch could flip argmax ties, so token identity here is the strongest evidence
available without real weights. The real-weights validation runbook is in PARITY.md.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from zoomearth_tpu.config import SpecialTokens, TextConfig, VisionConfig, VLMConfig
from zoomearth_tpu.models import params as P
from zoomearth_tpu.models import rope as R
from zoomearth_tpu.runtime.generate import (
    GenerationConfig,
    Generator,
    prepare_batch,
    prepare_continuation,
)


def _midsize_cfg(vocab=512):
    from zoomearth_tpu.config import databank_id

    vision = VisionConfig(
        depth=8, hidden_size=64, intermediate_size=128, num_heads=4,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
        window_size=56, fullatt_block_indexes=(3, 7), out_hidden_size=128,
    )
    text = TextConfig(
        vocab_size=vocab, hidden_size=128, intermediate_size=256,
        num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=2,  # GQA 4:1
        head_dim=16, tie_word_embeddings=True, mrope_section=(2, 3, 3),
    )
    tokens = SpecialTokens(
        image_pad=databank_id(vocab, 0), video_pad=databank_id(vocab, 1),
        vision_start=databank_id(vocab, 2), vision_end=databank_id(vocab, 3),
        im_start=databank_id(vocab, 4), im_end=databank_id(vocab, 5),
        endoftext=databank_id(vocab, 6), eos=databank_id(vocab, 5),
    )
    return VLMConfig(vision=vision, text=text, tokens=tokens, dtype="bfloat16")


CFG = _midsize_cfg()


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2_5_VLForConditionalGeneration
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLConfig

    t, v, tok = CFG.text, CFG.vision, CFG.tokens
    hf_cfg = Qwen2_5_VLConfig(
        vision_config=dict(
            depth=v.depth, hidden_size=v.hidden_size, intermediate_size=v.intermediate_size,
            num_heads=v.num_heads, in_channels=v.in_channels, patch_size=v.patch_size,
            temporal_patch_size=v.temporal_patch_size, spatial_merge_size=v.spatial_merge_size,
            window_size=v.window_size, fullatt_block_indexes=list(v.fullatt_block_indexes),
            out_hidden_size=v.out_hidden_size, hidden_act="silu",
        ),
        vocab_size=t.vocab_size, hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size, num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads, num_key_value_heads=t.num_key_value_heads,
        rope_theta=t.rope_theta, rms_norm_eps=t.rms_norm_eps,
        tie_word_embeddings=t.tie_word_embeddings,
        max_position_embeddings=t.max_position_embeddings,
        rope_scaling={"type": "mrope", "mrope_section": list(t.mrope_section)},
        image_token_id=tok.image_pad, video_token_id=tok.video_pad,
        vision_start_token_id=tok.vision_start, vision_end_token_id=tok.vision_end,
        bos_token_id=tok.im_start, eos_token_id=tok.eos, pad_token_id=tok.pad,
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    return Qwen2_5_VLForConditionalGeneration(hf_cfg).eval().to(torch.bfloat16)


@pytest.fixture(scope="module")
def generator(hf_model):
    params = P.convert_hf_state_dict(hf_model.state_dict(), CFG, dtype="bfloat16")
    return Generator(params, CFG, max_cache_len=512, cache_dtype="bfloat16")


def _image(grid, seed):
    rng = np.random.default_rng(seed)
    n = grid[0] * grid[1] * grid[2]
    return rng.standard_normal((n, CFG.vision.patch_dim)).astype(np.float32), grid


def _prompt(seed, grid=(1, 8, 8), n_pre=6, n_post=40):
    rng = np.random.default_rng(seed)
    tok = CFG.tokens
    pv, g = _image(grid, seed)
    n = (g[0] * g[1] * g[2]) // CFG.vision.merge_unit
    ids = (
        [tok.im_start] + list(rng.integers(1, 400, size=n_pre))
        + [tok.vision_start] + [tok.image_pad] * n + [tok.vision_end]
        + list(rng.integers(1, 400, size=n_post))
    )
    return ids, [(pv, g)]


def _hf_generate(hf_model, ids, images, max_new):
    pv = np.concatenate([p for p, _ in images], axis=0)
    grids = [g for _, g in images]
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.from_numpy(pv).to(torch.bfloat16),
            image_grid_thw=torch.tensor(grids, dtype=torch.long),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
            max_new_tokens=max_new, do_sample=False,
            eos_token_id=None, pad_token_id=CFG.tokens.pad,
        )
    return out[0, len(ids):].tolist()


def _trim(tokens):
    stops = (CFG.tokens.eos, CFG.tokens.endoftext)
    for i, t in enumerate(tokens):
        if t in stops:
            return tokens[:i]
    return tokens


def test_stage1_bf16_token_identity(hf_model, generator):
    ids, imgs = _prompt(seed=31)
    want = _hf_generate(hf_model, ids, imgs, max_new=24)
    b = prepare_batch(CFG, [ids], [imgs], length_buckets=(128,), patch_buckets=(128,))
    got = generator.generate(b, GenerationConfig(max_new_tokens=24))[0]
    assert got == _trim(want)[: len(got)] and len(got) >= min(24, len(_trim(want)))


def test_two_stage_stitched_kv_reuse_token_identity(hf_model, generator):
    """Stage 1 -> keep a completion prefix -> append a second image -> stage 2 decode.
    The KV-reuse continuation must match HF generate over the STITCHED sequence."""
    ids1, imgs1 = _prompt(seed=32)
    b1 = prepare_batch(CFG, [ids1], [imgs1], length_buckets=(128,), patch_buckets=(128,))
    out1, cache = generator.generate(
        b1, GenerationConfig(max_new_tokens=16), return_cache=True
    )
    comp1 = out1[0]
    assert len(comp1) >= 4
    kept = comp1[: len(comp1) // 2]  # mimic the pre-<answer> split

    tok = CFG.tokens
    pv2, g2 = _image((1, 6, 6), seed=33)
    n2 = (g2[0] * g2[1] * g2[2]) // CFG.vision.merge_unit
    chunk = [tok.vision_start] + [tok.image_pad] * n2 + [tok.vision_end]

    # oracle: HF generate on the full stitched prompt (prompt1 + kept + image2)
    stitched = list(ids1) + kept + chunk
    want = _hf_generate(hf_model, stitched, imgs1 + [(pv2, g2)], max_new=16)

    keep_len = len(ids1) + len(kept)
    start_pos = int(b1.next_pos[0]) + len(kept)
    bc = prepare_continuation(CFG, [chunk], [[(pv2, g2)]], [start_pos],
                              length_buckets=(64,), patch_buckets=(128,))
    got = generator.continue_generate(
        cache, bc, np.asarray([keep_len]), GenerationConfig(max_new_tokens=16)
    )[0]
    assert got == _trim(want)[: len(got)] and len(got) >= min(16, len(_trim(want)))


def test_pair_decode_bf16_token_identity(hf_model, generator):
    """bf16 mid-size pair decode: co-batched two-group decode + solo resume must
    equal the sequential solo decodes token for token (the TPU serving dtype)."""
    from zoomearth_tpu.runtime.generate import prepare_batch

    def build(seeds):
        seqs, imgs = [], []
        for s in seeds:
            ids, im = _prompt(s, n_post=10 + s % 3)
            seqs.append(ids)
            imgs.append(im)
        return prepare_batch(CFG, seqs, imgs, length_buckets=(128,), patch_buckets=(128,))

    ba, bb = build((21, 22)), build((31, 32))
    ref_a = generator.generate(ba, GenerationConfig(max_new_tokens=10))
    ref_b = generator.generate(bb, GenerationConfig(max_new_tokens=6))
    la, ca, aa = generator.run_prefill(ba, max_new=10)
    lb, cb, ab = generator.run_prefill(bb, max_new=6)
    buf_a, done_a, la2, ca, buf_b, _, _, _ = generator.run_decode_pair(
        (la, ca, ba.next_pos, aa, None), (lb, cb, bb.next_pos, ab, None), steps=6,
    )
    assert generator.trim_generated(np.asarray(buf_b)) == ref_b
    rest, _ = generator.run_decode(
        la2, ca, np.asarray(ba.next_pos) + 6, GenerationConfig(max_new_tokens=4),
        attend=aa, done0=done_a,
    )
    full = np.concatenate([np.asarray(buf_a), np.asarray(rest)], axis=1)
    assert generator.trim_generated(full) == ref_a
