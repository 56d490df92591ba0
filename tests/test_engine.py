"""Continuous-batching engine tests: greedy parity with the batch Generator, slot reuse,
queueing beyond capacity, mixed completion lengths."""

import numpy as np
import pytest

import jax

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.runtime.generate import GenerationConfig, Generator, prepare_batch
from zoomearth_tpu.serve.engine import Request, ServingEngine

CFG = VLMConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return init_vlm_params(jax.random.key(0), CFG)


@pytest.fixture(scope="module")
def reference_gen(params):
    return Generator(params, CFG, max_cache_len=256, cache_dtype="float32")


def _image(grid, seed):
    rng = np.random.default_rng(seed)
    pv = rng.standard_normal((grid[0] * grid[1] * grid[2], CFG.vision.patch_dim)).astype(np.float32)
    return pv, grid


def _prompt(seed, n_text=8, grid=None):
    rng = np.random.default_rng(seed)
    tok = CFG.tokens
    ids = [tok.im_start] + list(rng.integers(1, 400, size=n_text))
    imgs = []
    if grid:
        pv, g = _image(grid, seed)
        n = (g[0] * g[1] * g[2]) // CFG.vision.merge_unit
        ids += [tok.vision_start] + [tok.image_pad] * n + [tok.vision_end]
        imgs = [(pv, g)]
    return ids, imgs


def _reference_output(gen, ids, imgs, max_new):
    batch = prepare_batch(CFG, [ids], [imgs], length_buckets=(64,), patch_buckets=(64,) if imgs else (0,))
    return gen.generate(batch, GenerationConfig(max_new_tokens=max_new))[0]


def test_engine_matches_generator_greedy(params, reference_gen):
    engine = ServingEngine(
        params, CFG, max_slots=2, max_seq_len=128, decode_chunk=4,
        cache_dtype="float32", length_buckets=(64, 128), patch_buckets=(64,),
    )
    prompts = [_prompt(1, 6), _prompt(2, 9, grid=(1, 4, 4)), _prompt(3, 12)]
    for i, (ids, imgs) in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", token_ids=ids, images=imgs, max_tokens=10))
    engine.run_until_idle()
    for i, (ids, imgs) in enumerate(prompts):
        got = engine.get_completion(f"r{i}", timeout=1).token_ids
        want = _reference_output(reference_gen, ids, imgs, 10)
        # engine pads to "length" finish; generator trims at stop — compare prefix rules
        if len(got) > len(want):
            got = got[: len(want)]
        assert got == want[: len(got)] and len(got) >= min(10, len(want)), f"req r{i}"


def test_queue_beyond_capacity_and_slot_reuse(params):
    engine = ServingEngine(
        params, CFG, max_slots=2, max_seq_len=128, decode_chunk=2,
        cache_dtype="float32", length_buckets=(64,), patch_buckets=(0,),
    )
    n = 5
    for i in range(n):
        ids, _ = _prompt(10 + i, 5 + i)
        engine.submit(Request(request_id=f"q{i}", token_ids=ids, images=[], max_tokens=4))
    engine.run_until_idle()
    done = [engine.get_completion(f"q{i}", timeout=1) for i in range(n)]
    assert all(len(c.token_ids) <= 4 for c in done)
    assert engine.stats["completed"] == n
    assert engine.stats["prefill_rows"] == n
    assert engine.stats["prefills"] <= n  # admissions are batched


def test_oversized_request_rejected(params):
    engine = ServingEngine(params, CFG, max_slots=1, max_seq_len=64, cache_dtype="float32",
                           length_buckets=(64,), patch_buckets=(0,))
    ids, _ = _prompt(1, 50)
    with pytest.raises(ValueError):
        engine.submit(Request(request_id="big", token_ids=ids, images=[], max_tokens=60))


def test_background_pump(params):
    engine = ServingEngine(
        params, CFG, max_slots=2, max_seq_len=128, decode_chunk=2,
        cache_dtype="float32", length_buckets=(64,), patch_buckets=(0,),
    )
    engine.start()
    try:
        ids, _ = _prompt(7, 6)
        engine.submit(Request(request_id="bg", token_ids=ids, images=[], max_tokens=6))
        c = engine.get_completion("bg", timeout=60)
        assert len(c.token_ids) <= 6
    finally:
        engine.stop()


def test_cancel_prefix_no_slot_leak(params):
    """cancel_prefix must drop queued work, let in-flight rows drain, and sweep
    held slots + results WITHOUT leaking pool rows — the GRPO error-path teardown
    against a persistent engine (train/grpo.py _engine_rollout finally-block)."""
    engine = ServingEngine(
        params, CFG, max_slots=2, max_seq_len=128, decode_chunk=2,
        cache_dtype="float32", length_buckets=(64,), patch_buckets=(0,),
    )
    ids_a, _ = _prompt(20, 6)
    ids_b, _ = _prompt(21, 7)
    ids_c, _ = _prompt(22, 8)
    # cx0 + keep0 fill both slots; cx1 stays queued (the queued-drop path)
    engine.submit(Request(request_id="cx0", token_ids=ids_a, images=[], max_tokens=8, hold_slot=True))
    engine.submit(Request(request_id="keep0", token_ids=ids_b, images=[], max_tokens=6))
    engine.submit(Request(request_id="cx1", token_ids=ids_c, images=[], max_tokens=8, hold_slot=True))
    engine.step()  # admit + first decode chunk: cx0/keep0 now IN FLIGHT
    assert engine.active.any()
    engine.cancel_prefix("cx")
    # the in-flight hold_slot row completed and was then swept: no held slot, no result
    assert not any(k.startswith("cx") for k in engine.held)
    assert not any(k.startswith("cx") for k in engine.results)
    # the foreign request is untouched
    engine.run_until_idle()
    assert len(engine.get_completion("keep0", timeout=1).token_ids) <= 6
    # no leak: two NEW hold_slot requests must both find free slots
    for i in range(2):
        ids, _ = _prompt(30 + i, 6)
        engine.submit(Request(request_id=f"n{i}", token_ids=ids, images=[], max_tokens=4, hold_slot=True))
    engine.run_until_idle()
    assert sorted(engine.held) == ["n0", "n1"]


def test_mixed_temperature(params):
    engine = ServingEngine(
        params, CFG, max_slots=2, max_seq_len=128, decode_chunk=2,
        cache_dtype="float32", length_buckets=(64,), patch_buckets=(0,),
    )
    ids, _ = _prompt(5, 8)
    engine.submit(Request(request_id="g", token_ids=ids, images=[], max_tokens=6, temperature=0.0))
    engine.submit(Request(request_id="t", token_ids=ids, images=[], max_tokens=6, temperature=1.5))
    engine.run_until_idle()
    g = engine.get_completion("g", timeout=1)
    t = engine.get_completion("t", timeout=1)
    assert all(0 <= x < CFG.text.vocab_size for x in g.token_ids + t.token_ids)


def test_prefix_cache_token_identity(params, reference_gen):
    """Requests sharing a 'system + image' leading span: the second request hits the
    prefix store (skipping the span's prefill) and must emit IDENTICAL tokens to the
    cold path and to the batch Generator."""
    tok = CFG.tokens
    rng = np.random.default_rng(7)
    pv, grid = _image((1, 4, 4), 7)
    n_img = (grid[0] * grid[1] * grid[2]) // CFG.vision.merge_unit
    prefix_ids = [tok.im_start] + list(rng.integers(1, 400, size=4)) + \
        [tok.vision_start] + [tok.image_pad] * n_img + [tok.vision_end]
    suffixes = [list(rng.integers(1, 400, size=6)) for _ in range(3)]

    engine = ServingEngine(
        params, CFG, max_slots=2, max_seq_len=128, decode_chunk=4,
        cache_dtype="float32", length_buckets=(64, 128), patch_buckets=(64,),
    )
    for i, suf in enumerate(suffixes):
        engine.submit(Request(
            request_id=f"p{i}", token_ids=prefix_ids + suf, images=[(pv, grid)],
            max_tokens=8, prefix_key="imgA", prefix_len=len(prefix_ids), n_prefix_images=1,
        ))
        engine.run_until_idle()  # serialize so hit/miss is deterministic
    assert engine.stats["prefix_saves"] == 1
    assert engine.stats["prefix_hits"] == 2
    for i, suf in enumerate(suffixes):
        got = engine.get_completion(f"p{i}", timeout=1).token_ids
        want = _reference_output(reference_gen, prefix_ids + suf, [(pv, grid)], 8)
        if len(got) > len(want):
            got = got[: len(want)]
        assert got == want[: len(got)] and len(got) >= min(8, len(want)), f"req p{i}"


def test_oversized_image_burst_splits(params):
    """An admission burst whose images exceed the largest patch bucket splits into
    sub-batches instead of raising (cold first round: every row carries an image)."""
    engine = ServingEngine(
        params, CFG, max_slots=4, max_seq_len=128, decode_chunk=2,
        cache_dtype="float32", length_buckets=(64, 128), patch_buckets=(0, 32),
    )
    engine.admission_debounce_s = 0.0
    # each image = 16 patches; 3 of them > the 32-patch bucket -> must split
    prompts = [_prompt(10 + i, 6, grid=(1, 4, 4)) for i in range(3)]
    for i, (ids, imgs) in enumerate(prompts):
        engine.submit(Request(request_id=f"s{i}", token_ids=ids, images=imgs, max_tokens=3))
    engine.run_until_idle()
    assert all(f"s{i}" in engine.results for i in range(3))
    assert engine.stats["prefills"] >= 2  # split happened


def test_int8_kv_cache_engine(params):
    """The engine's row-compacted prefill must carry the int8 cache's per-token scales
    through its gather/scatter (regression: KVCache(k, v, length) dropped them and the
    decoder's quant path crashed on None). Prefix caching now COMPOSES with int8 (the
    pool stores int8 values + scale rows), so the prefix_key request saves its span."""
    engine = ServingEngine(
        params, CFG, max_slots=2, max_seq_len=128, decode_chunk=4,
        cache_dtype="int8", length_buckets=(64, 128), patch_buckets=(0, 64),
    )
    engine.admission_debounce_s = 0.0
    prompts = [_prompt(21, 6), _prompt(22, 9, grid=(1, 4, 4)), _prompt(23, 12)]
    for i, (ids, imgs) in enumerate(prompts):
        engine.submit(Request(request_id=f"q{i}", token_ids=ids, images=imgs,
                              max_tokens=6, prefix_key="p" if i == 0 else None,
                              prefix_len=3 if i == 0 else 0))
    engine.run_until_idle()
    for i in range(3):
        c = engine.get_completion(f"q{i}", timeout=1)
        assert len(c.token_ids) >= 1
    assert engine.stats["prefix_saves"] == 1  # int8 mode: prefix caching composes


def test_prefix_cache_token_identity_int8(params):
    """Prefix caching under the int8 KV cache (VERDICT r3 item 2): the prefix pool
    carries int8 values + per-token scale rows, so a prefix HIT must emit tokens
    IDENTICAL to the cold full-prefill path at the same cache dtype (per-token
    quantization is deterministic, so hit and cold read bit-identical cache)."""
    tok = CFG.tokens
    rng = np.random.default_rng(11)
    pv, grid = _image((1, 4, 4), 11)
    n_img = (grid[0] * grid[1] * grid[2]) // CFG.vision.merge_unit
    prefix_ids = [tok.im_start] + list(rng.integers(1, 400, size=4)) + \
        [tok.vision_start] + [tok.image_pad] * n_img + [tok.vision_end]
    suffixes = [list(rng.integers(1, 400, size=6)) for _ in range(3)]

    def run(with_prefix):
        engine = ServingEngine(
            params, CFG, max_slots=2, max_seq_len=128, decode_chunk=4,
            cache_dtype="int8", length_buckets=(64, 128), patch_buckets=(64,),
        )
        outs = []
        for i, suf in enumerate(suffixes):
            engine.submit(Request(
                request_id=f"p{i}", token_ids=prefix_ids + suf, images=[(pv, grid)],
                max_tokens=8,
                prefix_key="imgA" if with_prefix else None,
                prefix_len=len(prefix_ids) if with_prefix else 0,
                n_prefix_images=1 if with_prefix else 0,
            ))
            engine.run_until_idle()  # serialize so hit/miss is deterministic
        for i in range(len(suffixes)):
            outs.append(engine.get_completion(f"p{i}", timeout=1).token_ids)
        return engine, outs

    eng_hit, hit_outs = run(with_prefix=True)
    assert eng_hit.stats["prefix_saves"] == 1
    assert eng_hit.stats["prefix_hits"] == 2
    _, cold_outs = run(with_prefix=False)
    assert hit_outs == cold_outs


def test_decode_attend_bucketing_token_identity(params):
    """Attend-span bucketing (decode reads only a static cache prefix covering the
    live rows' extents): an engine whose allocation (512) exceeds the rows' needs
    must produce tokens identical to one with bucketing disabled."""
    def run(attend_buckets):
        eng = ServingEngine(params, CFG, max_slots=2, max_seq_len=512,
                            cache_dtype="float32", decode_chunk=4,
                            length_buckets=(64,), patch_buckets=(0, 16))
        if attend_buckets is not None:
            eng.decode_attend_buckets = attend_buckets
        outs = {}
        for i in range(3):
            ids, imgs = _prompt(60 + i, n_text=6, grid=(1, 4, 4) if i % 2 else None)
            eng.submit(Request(request_id=f"a{i}", token_ids=ids, images=imgs,
                               max_tokens=8, temperature=0.0))
        eng.run_until_idle()
        for i in range(3):
            outs[i] = eng.get_completion(f"a{i}", timeout=5).token_ids
        return outs, eng

    ref, _ = run(())  # bucketing disabled: full-span reads
    got, eng = run((64, 128, 256))
    assert got == ref
    # the bucketed engine really compiled a prefix-read decode program
    assert any(a is not None for (_, a) in eng._decode_compact_fns) or any(
        a is not None for a in eng._decode_full_fns
    ), (list(eng._decode_compact_fns), list(eng._decode_full_fns))


def test_submit_rejects_over_bucket_prompt(params):
    """A prompt longer than the largest prefill bucket is rejected at submit (the
    caller gets a clean error) instead of poisoning an admission batch."""
    engine = ServingEngine(params, CFG, max_slots=1, max_seq_len=256,
                           cache_dtype="float32", length_buckets=(64,), patch_buckets=(0,))
    ids, _ = _prompt(1, 100)
    with pytest.raises(ValueError, match="largest prefill bucket"):
        engine.submit(Request(request_id="big", token_ids=ids, images=[], max_tokens=8))


def test_admission_failure_does_not_kill_pump(params):
    """r5 robustness: an admission batch whose prep raises (here: a continuation
    chunk exceeding the largest bucket) must error-complete its requests — NOT kill
    the pump thread (which would hang every later get_completion forever, the
    pre-fix failure mode) — and the engine keeps serving new requests after."""
    from zoomearth_tpu.serve.engine import Continuation

    engine = ServingEngine(
        params, CFG, max_slots=2, max_seq_len=512, decode_chunk=2,
        cache_dtype="float32", length_buckets=(64,), patch_buckets=(0,),
    )
    engine.start()
    try:
        ids, _ = _prompt(11, 6)
        engine.submit(Request(request_id="p0", token_ids=ids, images=[],
                              max_tokens=4, hold_slot=True))
        assert engine.get_completion("p0", timeout=60).finish_reason in ("stop", "length")
        # continuation whose chunk exceeds the 64-token bucket -> admission failure
        big_chunk = list(np.random.default_rng(0).integers(1, 400, size=80))
        engine.submit_continuation(Continuation(
            request_id="c0", parent_request_id="p0", chunk_ids=big_chunk,
            images=[], kept_tokens=0, max_tokens=4,
        ))
        c = engine.get_completion("c0", timeout=60)
        assert c.finish_reason == "error" and c.token_ids == []
        assert engine.stats.get("errors", 0) == 1
        # the held slot was swept (no leak) and the engine still serves
        assert "p0" not in engine.held
        assert not any(s.held for s in engine.slots)
        ids2, _ = _prompt(12, 8)
        engine.submit(Request(request_id="p1", token_ids=ids2, images=[], max_tokens=4))
        assert engine.get_completion("p1", timeout=60).finish_reason in ("stop", "length")
    finally:
        engine.stop()


def test_partial_batch_failure_does_not_rerun_committed_rows(params):
    """r5 review fix: a patch-cap split runs groups sequentially; when a later group
    fails, rows already committed (slot active, first token emitted) must NOT be
    re-run by the isolation retry — a re-run would resample their first token and
    double-fire on_tokens."""
    from zoomearth_tpu.serve.engine import Continuation

    engine = ServingEngine(
        params, CFG, max_slots=3, max_seq_len=512, decode_chunk=2,
        cache_dtype="float32", length_buckets=(64,), patch_buckets=(0, 16),
    )
    emissions = []
    engine.on_tokens = lambda rid, toks: emissions.append(rid)
    engine.start()
    try:
        ids0, _ = _prompt(21, 5)
        engine.submit(Request(request_id="parent", token_ids=ids0, images=[],
                              max_tokens=3, hold_slot=True))
        assert engine.get_completion("parent", timeout=60).finish_reason in ("stop", "length")
        engine.stop()  # stage the co-admission deterministically
        # two 16-patch image requests + a poison continuation (over-bucket chunk):
        # combined patches (32) exceed patch_buckets[-1]=16, so the batch takes the
        # split path — group [img1] COMMITS (slot active, first token emitted), then
        # the group holding the poison raises
        ids1, imgs1 = _prompt(22, 5, grid=(1, 4, 4))
        engine.submit(Request(request_id="img1", token_ids=ids1, images=imgs1,
                              max_tokens=3))
        ids2, imgs2 = _prompt(23, 7, grid=(1, 4, 4))
        engine.submit(Request(request_id="img2", token_ids=ids2, images=imgs2,
                              max_tokens=3))
        engine.submit_continuation(Continuation(
            request_id="poison", parent_request_id="parent",
            chunk_ids=list(np.random.default_rng(0).integers(1, 400, size=80)),
            images=[], kept_tokens=0, max_tokens=3,
        ))
        engine.start()
        cp = engine.get_completion("poison", timeout=60)
        c1 = engine.get_completion("img1", timeout=60)
        c2 = engine.get_completion("img2", timeout=60)
        assert cp.finish_reason == "error"
        assert c1.finish_reason in ("stop", "length"), c1
        assert c2.finish_reason in ("stop", "length"), c2
        # the committed row's token emissions are consistent with ONE prefill +
        # decode chunks — a retry re-run would double-emit its first token
        n1 = sum(1 for r in emissions if r == "img1")
        assert n1 <= 1 + len(c1.token_ids), (n1, c1)
        # engine still serves
        ids2, _ = _prompt(23, 6)
        engine.submit(Request(request_id="after", token_ids=ids2, images=[], max_tokens=3))
        assert engine.get_completion("after", timeout=60).finish_reason in ("stop", "length")
    finally:
        engine.stop()


def test_submit_accepts_prefix_request_with_long_prompt(params):
    """The submit guard applies to the post-prefix CHUNK: a prefix-KV request whose
    full prompt exceeds the largest bucket but whose chunk fits must be accepted
    (a prefix hit only prefills the chunk); on a prefix MISS it fails safely via
    admission containment instead of hanging."""
    engine = ServingEngine(params, CFG, max_slots=1, max_seq_len=512,
                           cache_dtype="float32", length_buckets=(64,), patch_buckets=(0,))
    rng = np.random.default_rng(3)
    long_ids = [CFG.tokens.im_start] + list(rng.integers(1, 400, size=100))
    engine.submit(Request(request_id="pfx", token_ids=long_ids, images=[],
                          max_tokens=4, prefix_key="shared-sys", prefix_len=80))
    engine.run_until_idle()
    # miss path: full 101-token prefill exceeds the 64 bucket -> contained error
    assert engine.get_completion("pfx", timeout=5).finish_reason == "error"
    # non-prefix request with the same prompt stays rejected at submit
    with pytest.raises(ValueError, match="largest prefill bucket"):
        engine.submit(Request(request_id="plain", token_ids=long_ids, images=[],
                              max_tokens=4))
