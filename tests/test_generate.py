"""Generation parity: our jitted prefill+decode loop vs HF generate (greedy, tiny model)."""

import numpy as np
import pytest

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models import params as P
from zoomearth_tpu.runtime.generate import (
    GenerationConfig,
    Generator,
    PreparedBatch,
    bucket,
    prepare_batch,
)
from zoomearth_tpu.tokenizer import FakeTokenizer

CFG = VLMConfig.tiny()


@pytest.fixture(scope="module")
def hf_model():
    from tests.test_model_parity import hf_model as make

    # reuse the fixture function body via direct construction
    import torch
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
    torch.manual_seed(0)
    return Qwen2_5_VLForConditionalGeneration(hf_cfg).eval().float()


@pytest.fixture(scope="module")
def generator(hf_model):
    params = P.convert_hf_state_dict(hf_model.state_dict(), CFG, dtype="float32")
    return Generator(params, CFG, max_cache_len=256, cache_dtype="float32")


def _image_seq(grid, seed):
    rng = np.random.default_rng(seed)
    tok = CFG.tokens
    n = (grid[0] * grid[1] * grid[2]) // CFG.vision.merge_unit
    ids = (
        [tok.im_start]
        + list(rng.integers(1, 400, size=4))
        + [tok.vision_start]
        + [tok.image_pad] * n
        + [tok.vision_end]
        + list(rng.integers(1, 400, size=3))
    )
    pv = rng.standard_normal(
        (grid[0] * grid[1] * grid[2], CFG.vision.patch_dim)
    ).astype(np.float32)
    return ids, pv, grid


def _hf_generate(hf_model, ids_list, pv_list, grids, max_new):
    import torch

    # left-pad to equal length (HF decoder-only convention)
    S = max(len(x) for x in ids_list)
    B = len(ids_list)
    ids = np.full((B, S), CFG.tokens.pad, dtype=np.int64)
    mask = np.zeros((B, S), dtype=np.int64)
    for b, x in enumerate(ids_list):
        ids[b, S - len(x):] = x
        mask[b, S - len(x):] = 1
    kwargs = dict(
        input_ids=torch.from_numpy(ids),
        attention_mask=torch.from_numpy(mask),
        max_new_tokens=max_new,
        do_sample=False,
        num_beams=1,
    )
    if pv_list:
        kwargs["pixel_values"] = torch.from_numpy(np.concatenate(pv_list, axis=0))
        kwargs["image_grid_thw"] = torch.tensor(grids, dtype=torch.long)
    with torch.no_grad():
        out = hf_model.generate(**kwargs)
    gen = out[:, S:].numpy()
    result = []
    for row in gen:
        stops = np.isin(row, (CFG.tokens.eos, CFG.tokens.endoftext))
        end = int(np.argmax(stops)) if stops.any() else len(row)
        result.append(row[:end].tolist())
    return result


def test_greedy_parity_single_with_image(hf_model, generator):
    ids, pv, grid = _image_seq((1, 4, 4), seed=7)
    ref = _hf_generate(hf_model, [ids], [pv], [grid], max_new=12)
    batch = prepare_batch(CFG, [ids], [[(pv, grid)]], length_buckets=(32, 64, 128), patch_buckets=(16, 32, 64))
    out = generator.generate(batch, GenerationConfig(max_new_tokens=12))
    assert out == ref


def test_greedy_parity_batch_mixed_lengths(hf_model, generator):
    s1, pv1, g1 = _image_seq((1, 4, 4), seed=1)
    s2, pv2, g2 = _image_seq((1, 2, 6), seed=2)
    s2 = s2 + [33, 44]  # different length
    ref = _hf_generate(hf_model, [s1, s2], [pv1, pv2], [g1, g2], max_new=10)
    batch = prepare_batch(CFG, [s1, s2], [[(pv1, g1)], [(pv2, g2)]],
                          length_buckets=(64,), patch_buckets=(64,))
    out = generator.generate(batch, GenerationConfig(max_new_tokens=10))
    assert out == ref


def test_greedy_parity_text_only(hf_model, generator):
    rng = np.random.default_rng(5)
    s1 = [CFG.tokens.im_start] + list(rng.integers(1, 400, size=6))
    s2 = [CFG.tokens.im_start] + list(rng.integers(1, 400, size=9))
    ref = _hf_generate(hf_model, [s1, s2], [], [], max_new=8)
    batch = prepare_batch(CFG, [s1, s2], [[], []], length_buckets=(16,), patch_buckets=(0,))
    out = generator.generate(batch, GenerationConfig(max_new_tokens=8))
    assert out == ref


def test_bucketing_invariance(generator):
    """Same prompt through different length/patch buckets must produce identical output."""
    ids, pv, grid = _image_seq((1, 4, 4), seed=9)
    outs = []
    for lb, pb in [((32,), (32,)), ((64,), (64,)), ((128,), (128,))]:
        batch = prepare_batch(CFG, [ids], [[(pv, grid)]], length_buckets=lb, patch_buckets=pb)
        outs.append(generator.generate(batch, GenerationConfig(max_new_tokens=8)))
    assert outs[0] == outs[1] == outs[2]


def test_temperature_sampling_runs(generator):
    ids, pv, grid = _image_seq((1, 4, 4), seed=3)
    batch = prepare_batch(CFG, [ids], [[(pv, grid)]], length_buckets=(64,), patch_buckets=(64,))
    out = generator.generate(batch, GenerationConfig(max_new_tokens=8, temperature=0.7, top_p=0.9), seed=123)
    assert len(out) == 1 and all(0 <= t < CFG.text.vocab_size for t in out[0])


def test_bucket_helper():
    assert bucket(100, (128, 256)) == 128
    assert bucket(128, (128, 256)) == 128
    assert bucket(129, (128, 256)) == 256
    with pytest.raises(ValueError):
        bucket(300, (128, 256))


def test_fake_tokenizer_roundtrip():
    tk = FakeTokenizer(CFG.tokens)
    text = "hello <|vision_start|><|image_pad|><|vision_end|> world"
    ids = tk.encode(text)
    assert tk.decode(ids, skip_special_tokens=False) == text
    assert tk.decode(ids) == "hello  world"


def test_split_row_prefill_matches_full(hf_model):
    """prefill_split_rows (embeds path, batch >= 96 capacity lever): slicing the
    prefill into row halves writing one donated full cache must produce tokens
    identical to the one-shot prefill."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from zoomearth_tpu.models.vit import vision_metadata
    from zoomearth_tpu.models.vlm import compute_vision_embeds, vision_meta_to_device

    params = P.convert_hf_state_dict(hf_model.state_dict(), CFG, dtype="float32")
    g_full = Generator(params, CFG, max_cache_len=256, cache_dtype="float32")
    g_split = Generator(params, CFG, max_cache_len=256, cache_dtype="float32",
                        prefill_split_rows=2)
    seqs, pvs, grids = [], [], []
    for seed in (1, 2, 3, 4):
        ids, pv, grid = _image_seq((1, 4, 4), seed=seed)
        seqs.append(ids + [7] * seed)  # varied lengths
        pvs.append(pv)
        grids.append(grid)
    batch = prepare_batch(CFG, seqs, [[(pv, g)] for pv, g in zip(pvs, grids)],
                          length_buckets=(64,), patch_buckets=(64,))
    # precompute the vision embeds (the split path requires the embeds input form)
    meta = vision_metadata(grids, CFG.vision, pad_to=batch.pixel_values.shape[0])
    embeds = compute_vision_embeds(
        params, CFG, jnp.asarray(batch.pixel_values), vision_meta_to_device(meta),
        win_mode=meta.win_mode,
    )
    batch = dataclasses.replace(batch, pixel_values=embeds, vision_meta=None)
    out_full = g_full.generate(batch, GenerationConfig(max_new_tokens=10))
    out_split = g_split.generate(batch, GenerationConfig(max_new_tokens=10))
    assert out_split == out_full


def test_attend_len_prefix_decode_token_identity(hf_model):
    """attend_len decode (full-size cache, static prefix read): a Generator whose
    alloc (512) exceeds the stage's attend bucket (256) must produce tokens identical
    to one allocated exactly at the bucket — including through a stage-2 continuation
    whose keep+chunk+new extent crosses into a larger attend bucket."""
    import dataclasses

    params = P.convert_hf_state_dict(hf_model.state_dict(), CFG, dtype="float32")
    g_big = Generator(params, CFG, max_cache_len=512, cache_dtype="float32")
    g_ref = Generator(params, CFG, max_cache_len=256, cache_dtype="float32")
    # stage 1: S=64 bucket + 10 new -> attend bucket 256 (< 512 alloc) in g_big
    seqs, pvs, grids = [], [], []
    for seed in (11, 12, 13):
        ids, pv, grid = _image_seq((1, 4, 4), seed=seed)
        seqs.append(ids + [9] * (seed % 7))
        pvs.append(pv)
        grids.append(grid)
    batch = prepare_batch(CFG, seqs, [[(pv, g)] for pv, g in zip(pvs, grids)],
                          length_buckets=(64,), patch_buckets=(64,))
    g1 = GenerationConfig(max_new_tokens=10)
    out_big, cache_big = g_big.generate(batch, g1, return_cache=True)
    out_ref, cache_ref = g_ref.generate(batch, g1, return_cache=True)
    assert out_big == out_ref
    # the big generator's stage-1 decode really compiled a prefix-read program
    assert any(k[-1] == 256 for k in g_big._decode_fns), list(g_big._decode_fns)
    assert all(k[-1] is None for k in g_ref._decode_fns)
    # stage 2: continuation pushes need past 256 -> g_big reads a bigger span
    from zoomearth_tpu.runtime.generate import prepare_continuation

    tok = CFG.tokens
    ids2, pv2, grid2 = _image_seq((1, 4, 4), seed=21)
    chunks = [[tok.vision_start] + [tok.image_pad] * 4 + [tok.vision_end]] * 3
    keep = np.asarray([int(batch.lengths[i]) + len(out_big[i]) for i in range(3)], np.int32)
    starts = [int(batch.next_pos[i]) + len(out_big[i]) for i in range(3)]
    bc = prepare_continuation(CFG, chunks, [[(pv2, grid2)]] * 3, starts)
    g2 = GenerationConfig(max_new_tokens=8)
    out2_big = g_big.continue_generate(cache_big, bc, keep, g2)
    out2_ref = g_ref.continue_generate(cache_ref, bc, keep, g2)
    assert out2_big == out2_ref


def test_int8_lm_head_plumbing(hf_model):
    """quantize_decoder_int8(lm_head=True): logits head streams the int8 copy; greedy
    decode still runs and the fp32-vs-int8 logits error stays at quantization scale."""
    import jax.numpy as jnp

    from zoomearth_tpu.models.decoder import logits_from_hidden
    from zoomearth_tpu.ops.quant import quantize_decoder_int8

    params = P.convert_hf_state_dict(hf_model.state_dict(), CFG, dtype="float32")
    qparams = quantize_decoder_int8(params, lm_head=True)
    assert "lm_head_q8" in qparams["text"]
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.standard_normal((2, 1, CFG.text.hidden_size)), jnp.float32)
    ref = logits_from_hidden(params["text"], CFG.text, hidden)
    q = logits_from_hidden(qparams["text"], CFG.text, hidden)
    # per-column int8: relative error bounded by the quantization step
    denom = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(q - ref))) / denom < 0.02
    # end-to-end: generation runs with the quantized head
    ids, pv, grid = _image_seq((1, 4, 4), seed=3)
    batch = prepare_batch(CFG, [ids], [[(pv, grid)]],
                          length_buckets=(64,), patch_buckets=(16,))
    gq = Generator(qparams, CFG, max_cache_len=128, cache_dtype="float32")
    out = gq.generate(batch, GenerationConfig(max_new_tokens=6))
    assert len(out) == 1 and len(out[0]) <= 6


def test_pair_decode_token_identity(hf_model):
    """run_decode_pair (co-batched two-group decode, one dense pass per step) +
    solo resume must produce tokens identical to the sequential solo decodes
    (greedy). Group a = a fresh stage-1 batch decoding 12 tokens (5 paired + 7
    solo resume); group b = an independent batch decoding 5."""
    params = P.convert_hf_state_dict(hf_model.state_dict(), CFG, dtype="float32")
    g = Generator(params, CFG, max_cache_len=256, cache_dtype="float32")

    def build(seeds):
        seqs, imgs = [], []
        for s in seeds:
            ids, pv, grid = _image_seq((1, 4, 4), seed=s)
            seqs.append(ids + [3] * (s % 5))
            imgs.append([(pv, grid)])
        return prepare_batch(CFG, seqs, imgs, length_buckets=(64,), patch_buckets=(64,))

    batch_a, batch_b = build((31, 32)), build((41, 42))
    ref_a = g.generate(batch_a, GenerationConfig(max_new_tokens=12))
    ref_b = g.generate(batch_b, GenerationConfig(max_new_tokens=5))

    la, ca, aa = g.run_prefill(batch_a, max_new=12)
    lb, cb, ab = g.run_prefill(batch_b, max_new=5)
    buf_a, done_a, la2, ca, buf_b, done_b, lb2, cb = g.run_decode_pair(
        (la, ca, batch_a.next_pos, aa, None),
        (lb, cb, batch_b.next_pos, ab, None),
        steps=5,
    )
    toks_b = g.trim_generated(np.asarray(buf_b))
    assert toks_b == ref_b
    rest, ca = g.run_decode(
        la2, ca, np.asarray(batch_a.next_pos) + 5,
        GenerationConfig(max_new_tokens=7), attend=aa, done0=done_a,
    )
    full = np.concatenate([np.asarray(buf_a), np.asarray(rest)], axis=1)
    assert g.trim_generated(full) == ref_a


def test_pair_decode_int8_kv(hf_model):
    """Pair decode over int8 KV caches (decode_attention_q8 inside
    _decode_write_attend) matches the solo int8-KV decode."""
    params = P.convert_hf_state_dict(hf_model.state_dict(), CFG, dtype="float32")
    g = Generator(params, CFG, max_cache_len=256, cache_dtype="int8")
    ids, pv, grid = _image_seq((1, 4, 4), seed=51)
    batch = prepare_batch(CFG, [ids], [[(pv, grid)]],
                          length_buckets=(64,), patch_buckets=(16,))
    ref = g.generate(batch, GenerationConfig(max_new_tokens=6))
    la, ca, aa = g.run_prefill(batch, max_new=6)
    lb, cb, ab = g.run_prefill(batch, max_new=6)
    buf_a, done_a, _, _, buf_b, _, _, _ = g.run_decode_pair(
        (la, ca, batch.next_pos, aa, None),
        (lb, cb, batch.next_pos, ab, None),
        steps=6,
    )
    assert g.trim_generated(np.asarray(buf_a)) == ref
    assert g.trim_generated(np.asarray(buf_b)) == ref
