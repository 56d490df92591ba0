"""Cache-reuse continuation (stage-2 prefix reuse): token parity vs full re-prefill."""

import numpy as np
import pytest

import jax

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.runtime.generate import (
    GenerationConfig,
    Generator,
    prepare_batch,
    prepare_continuation,
)

CFG = VLMConfig.tiny()


@pytest.fixture(scope="module")
def generator():
    params = init_vlm_params(jax.random.key(0), CFG)
    return Generator(params, CFG, max_cache_len=256, cache_dtype="float32")


def _image(grid, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((grid[0] * grid[1] * grid[2], CFG.vision.patch_dim)).astype(np.float32), grid


def _stage1(seed, grid=(1, 4, 4)):
    rng = np.random.default_rng(seed)
    tok = CFG.tokens
    pv, g = _image(grid, seed)
    n = (g[0] * g[1] * g[2]) // CFG.vision.merge_unit
    ids = ([tok.im_start] + list(rng.integers(1, 400, size=5))
           + [tok.vision_start] + [tok.image_pad] * n + [tok.vision_end]
           + list(rng.integers(1, 400, size=4)))
    return ids, [(pv, g)]


def _vision_chunk(grid, seed):
    tok = CFG.tokens
    pv, g = _image(grid, seed)
    n = (g[0] * g[1] * g[2]) // CFG.vision.merge_unit
    return [tok.vision_start] + [tok.image_pad] * n + [tok.vision_end], [(pv, g)]


@pytest.mark.parametrize("kept_fraction", [1.0, 0.5])
def test_continuation_matches_full_prefill(generator, kept_fraction):
    """stage1 -> keep (all or part of) completion -> append image chunk -> decode must
    equal one full prefill over the stitched kept sequence."""
    gen1 = GenerationConfig(max_new_tokens=8, temperature=0.0)
    ids1, imgs1 = _stage1(seed=11)
    b1 = prepare_batch(CFG, [ids1], [imgs1], length_buckets=(64,), patch_buckets=(16,))
    out1, cache = generator.generate(b1, gen1, return_cache=True)
    comp1 = out1[0]
    assert len(comp1) > 0
    kept = comp1[: max(1, int(len(comp1) * kept_fraction))]

    chunk_ids, chunk_imgs = _vision_chunk((1, 2, 4), seed=12)
    keep_len = len(ids1) + len(kept)
    start_pos = int(b1.next_pos[0]) + len(kept)
    bc = prepare_continuation(CFG, [chunk_ids], [chunk_imgs], [start_pos],
                              length_buckets=(16,), patch_buckets=(16,))
    gen2 = GenerationConfig(max_new_tokens=8, temperature=0.0)
    out_cont = generator.continue_generate(cache, bc, np.asarray([keep_len]), gen2, seed=0)

    # oracle: full prefill of the stitched sequence
    full_ids = list(ids1) + kept + chunk_ids
    bf = prepare_batch(CFG, [full_ids], [imgs1 + chunk_imgs],
                       length_buckets=(128,), patch_buckets=(32,))
    out_full = generator.generate(bf, gen2)
    assert out_cont == out_full


def test_continuation_batch_mixed_keep(generator):
    """Batched continuation with different keep lengths per row."""
    gen1 = GenerationConfig(max_new_tokens=6, temperature=0.0)
    s1 = [_stage1(seed=21), _stage1(seed=22, grid=(1, 2, 6))]
    b1 = prepare_batch(CFG, [s[0] for s in s1], [s[1] for s in s1],
                       length_buckets=(64,), patch_buckets=(64,))
    out1, cache = generator.generate(b1, gen1, return_cache=True)
    keeps = [out1[0][:3], out1[1]]  # row 0 drops tail, row 1 keeps all
    chunks = [_vision_chunk((1, 2, 4), 23), _vision_chunk((1, 4, 4), 24)]
    keep_len = np.asarray([len(s1[i][0]) + len(keeps[i]) for i in range(2)])
    starts = [int(b1.next_pos[i]) + len(keeps[i]) for i in range(2)]
    bc = prepare_continuation(CFG, [c[0] for c in chunks], [c[1] for c in chunks], starts,
                              length_buckets=(32,), patch_buckets=(64,))
    gen2 = GenerationConfig(max_new_tokens=6, temperature=0.0)
    out_cont = generator.continue_generate(cache, bc, keep_len, gen2)

    for i in range(2):
        full_ids = list(s1[i][0]) + keeps[i] + chunks[i][0]
        bf = prepare_batch(CFG, [full_ids], [s1[i][1] + chunks[i][1]],
                           length_buckets=(128,), patch_buckets=(64,))
        out_full = generator.generate(bf, gen2)
        assert out_cont[i] == out_full[0], f"row {i}"


def test_continuation_grows_right_sized_cache():
    """With right_size_cache=True, generate() sizes the stage-1 cache to a bucket
    (256 here); a continuation
    whose keep+chunk+new budget exceeds it must grow the cache on device inside the
    chunk-prefill program and produce tokens identical to a full-size-from-the-start
    Generator (the zero-extended tail is masked by kv_len, so growth is exact)."""
    params = init_vlm_params(jax.random.key(0), CFG)
    g = Generator(params, CFG, max_cache_len=512, cache_dtype="float32",
                  right_size_cache=True)

    gen1 = GenerationConfig(max_new_tokens=8, temperature=0.0)
    ids1, imgs1 = _stage1(seed=31)
    b1 = prepare_batch(CFG, [ids1], [imgs1], length_buckets=(64,), patch_buckets=(16,))
    out1, cache = g.generate(b1, gen1, return_cache=True)
    assert cache.k[0].shape[2] == 256  # right-sized: bucket(64 + 8), not max_cache_len

    chunk_ids, chunk_imgs = _vision_chunk((1, 2, 4), seed=32)
    keep_len = len(ids1) + len(out1[0])
    start_pos = int(b1.next_pos[0]) + len(out1[0])
    bc = prepare_continuation(CFG, [chunk_ids], [chunk_imgs], [start_pos],
                              length_buckets=(16,), patch_buckets=(16,))
    # budget that overflows the 256-row stage-1 cache -> growth to 512
    gen2 = GenerationConfig(max_new_tokens=300, temperature=0.0)
    out_cont, cache2 = g.continue_generate(
        cache, bc, np.asarray([keep_len]), gen2, seed=0, return_cache=True)
    assert cache2.k[0].shape[2] == 512

    # oracle: one full prefill over the stitched kept sequence (512-row cache)
    full_ids = list(ids1) + out1[0] + chunk_ids
    bf = prepare_batch(CFG, [full_ids], [imgs1 + chunk_imgs],
                       length_buckets=(128,), patch_buckets=(32,))
    out_full = g.generate(bf, gen2)
    assert out_cont == out_full


def test_episode_reuse_cache_smoke(monkeypatch):
    """Full episode with reuse_cache=True on the real tiny model (forced bbox path)."""
    from PIL import Image

    from zoomearth_tpu.agent import prompts as PT
    from zoomearth_tpu.agent import episode as E
    from zoomearth_tpu.agent.processor import Processor
    from zoomearth_tpu.models.params import init_vlm_params
    from zoomearth_tpu.tokenizer import FakeTokenizer

    monkeypatch.setattr(PT, "stage1_prompt",
                        lambda q: PT.PREFIX + q + "\nGo.<|im_end|><|im_start|>assistant\n")
    params = init_vlm_params(jax.random.key(1), CFG)
    g = Generator(params, CFG, max_cache_len=512, cache_dtype="float32")
    proc = Processor(FakeTokenizer(CFG.tokens), CFG, max_pixels=4 * 28 * 28)
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (700, 700, 3), dtype=np.uint8))

    # force a bbox into stage-1 output by monkeypatching extract_bboxes at the episode
    # module level so both paths take stage 2
    monkeypatch.setattr(E, "extract_bboxes", lambda text, scale=1.0: [[100, 100, 200, 200]])

    r_plain = E.run_episodes(g, proc, ["q?"], [img],
                             gen=GenerationConfig(max_new_tokens=5), reuse_cache=False)
    r_reuse = E.run_episodes(g, proc, ["q?"], [img],
                             gen=GenerationConfig(max_new_tokens=5), reuse_cache=True)
    assert not r_plain[0].error and not r_reuse[0].error
    # Both paths complete stage 2. Exact output parity is NOT asserted here: the plain
    # path strips whitespace/special tokens from the decoded completion before
    # re-tokenizing (reference semantics) while cache reuse keeps the generated tokens
    # verbatim — equivalent for real model text, divergent for random-token mojibake.
    # Strict continuation-vs-full-prefill token parity is covered by the tests above.
    assert isinstance(r_reuse[0].stage2, str) and r_reuse[0].stage2 != ""


def test_text_chunk_after_image_prefix_matches_full_prefill():
    """The wave bench's prefix-KV mode: prefill [sys + image] once, then chunk-prefill
    only the [question + instruction] text (grow_to the full cache) — tokens must be
    identical to a one-shot prefill of the concatenated prompt (reference layout
    infer.py:180-184 puts the image before the question, making [sys+image] a shared
    per-image prefix; vLLM's enable_prefix_caching reuses exactly this span)."""
    import numpy as np

    from zoomearth_tpu.runtime.generate import (
        GenerationConfig,
        Generator,
        prepare_batch,
        prepare_continuation,
    )

    import jax as _jax

    params = init_vlm_params(_jax.random.key(0), CFG)
    gen = Generator(params, CFG, max_cache_len=256, cache_dtype="float32")
    tok = CFG.tokens
    rng = np.random.default_rng(77)
    grid = (1, 4, 4)
    n_img = (grid[0] * grid[1] * grid[2]) // CFG.vision.merge_unit
    pv = rng.standard_normal((grid[0] * grid[1] * grid[2], CFG.vision.patch_dim)).astype(np.float32)
    sys_ids = [tok.im_start] + list(rng.integers(1, 300, size=3))
    prefix = sys_ids + [tok.vision_start] + [tok.image_pad] * n_img + [tok.vision_end]
    questions = [list(rng.integers(1, 300, size=5 + i)) for i in range(2)]
    instr = list(rng.integers(1, 300, size=7))

    # reference: one-shot prefill of the full prompts
    full = prepare_batch(CFG, [prefix + q + instr for q in questions],
                         [[(pv, grid)], [(pv, grid)]],
                         length_buckets=(64,), patch_buckets=(32,))
    ref = gen.generate(full, GenerationConfig(max_new_tokens=8))

    # prefix-KV path: small holder generator + text-only chunk into a grown copy
    gen_pfx = Generator(params, CFG, max_cache_len=32, cache_dtype="float32")
    pb = prepare_batch(CFG, [prefix, prefix], [[(pv, grid)], [(pv, grid)]],
                       length_buckets=(32,), patch_buckets=(32,))
    _, holder, _ = gen_pfx.run_prefill(pb, max_new=0)
    bc = prepare_continuation(CFG, [q + instr for q in questions], [[], []],
                              np.asarray(pb.next_pos), length_buckets=(32,))
    logits, cache, attend = gen.run_chunk_prefill(
        holder, bc, np.asarray(pb.lengths, np.int32), max_new=8,
        grow_to=gen.max_cache_len,
    )
    toks, _ = gen.run_decode(logits, cache, bc.next_pos,
                             GenerationConfig(max_new_tokens=8), attend=attend)
    assert gen.trim_generated(np.asarray(toks)) == ref
    # a second wave reuses the UNTOUCHED holder with a different question
    q2 = [list(rng.integers(1, 300, size=9)), list(rng.integers(1, 300, size=4))]
    full2 = prepare_batch(CFG, [prefix + q + instr for q in q2],
                          [[(pv, grid)], [(pv, grid)]],
                          length_buckets=(64,), patch_buckets=(32,))
    ref2 = gen.generate(full2, GenerationConfig(max_new_tokens=8))
    bc2 = prepare_continuation(CFG, [q + instr for q in q2], [[], []],
                               np.asarray(pb.next_pos), length_buckets=(32,))
    logits2, cache2, attend2 = gen.run_chunk_prefill(
        holder, bc2, np.asarray(pb.lengths, np.int32), max_new=8,
        grow_to=gen.max_cache_len,
    )
    toks2, _ = gen.run_decode(logits2, cache2, bc2.next_pos,
                              GenerationConfig(max_new_tokens=8), attend=attend2)
    assert gen.trim_generated(np.asarray(toks2)) == ref2


def test_full_size_prefix_holder_survives_chunk_prefill():
    """ADVICE r4 (medium): a prefix holder whose allocation already EQUALS the grow
    target (the natural result of building it with the same Generator) must not be
    donated by run_chunk_prefill when grow_to is passed — wave 1 reuses the holder
    (run_paired_waves prefix path) and would otherwise hit 'Array has been deleted'."""
    params = init_vlm_params(jax.random.key(0), CFG)
    gen = Generator(params, CFG, max_cache_len=64, cache_dtype="float32")
    tok = CFG.tokens
    rng = np.random.default_rng(3)
    pfx_ids = [tok.im_start] + list(rng.integers(1, 300, size=6))
    pb = prepare_batch(CFG, [pfx_ids], [[]], length_buckets=(16,), patch_buckets=(0,))
    _, holder, _ = gen.run_prefill(pb, max_new=0)
    assert holder.k[0].shape[2] == gen.max_cache_len  # allocation == grow target
    keep = np.asarray(pb.lengths, np.int32)
    chunk = prepare_continuation(CFG, [list(rng.integers(1, 300, size=4))], [[]],
                                 np.asarray(pb.next_pos), length_buckets=(16,))
    outs = []
    for _ in range(2):  # second call crashes if the first donated the holder
        logits, cache, attend = gen.run_chunk_prefill(
            holder, chunk, keep, max_new=4, grow_to=gen.max_cache_len,
        )
        toks, _ = gen.run_decode(logits, cache, chunk.next_pos,
                                 GenerationConfig(max_new_tokens=4), attend=attend)
        outs.append(gen.trim_generated(np.asarray(toks)))
    assert outs[0] == outs[1]


def test_attend_bucket_flash_decode_rounds_to_512(monkeypatch):
    """ADVICE r4 (low): with the opt-in Pallas decode kernels enabled, attend spans
    must be multiples of their 512-token kv chunk or decoder._attn_layer silently
    falls back to XLA decode attention."""
    assert Generator._attend_bucket(700, 4096) == 768  # default: smallest bucket
    monkeypatch.setenv("ZOOMEARTH_FLASH_DECODE", "1")
    assert Generator._attend_bucket(700, 4096) == 1024
    assert Generator._attend_bucket(1100, 4096) == 1536
    monkeypatch.delenv("ZOOMEARTH_FLASH_DECODE")
    monkeypatch.setenv("ZOOMEARTH_FLASH_DECODE_Q8", "1")
    assert Generator._attend_bucket(700, 4096) == 1024
