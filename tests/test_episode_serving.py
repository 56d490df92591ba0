"""Episode-aware serving tests: held slots, continuations, and the pipelined driver."""

import numpy as np
import pytest
from PIL import Image

import jax

from zoomearth_tpu.agent import prompts as PT
from zoomearth_tpu.agent.processor import Processor
from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.serve.engine import Continuation, Request, ServingEngine
from zoomearth_tpu.serve.episodes import run_episodes_served
from zoomearth_tpu.tokenizer import FakeTokenizer

CFG = VLMConfig.tiny()


@pytest.fixture
def engine():
    params = init_vlm_params(jax.random.key(0), CFG)
    return ServingEngine(
        params, CFG, max_slots=2, max_seq_len=512, decode_chunk=2,
        cache_dtype="float32", length_buckets=(64, 128, 256, 512), patch_buckets=(0, 16, 64),
    )


def _prompt(seed, n=8):
    rng = np.random.default_rng(seed)
    return [CFG.tokens.im_start] + list(rng.integers(1, 400, size=n))


class TestHeldSlots:
    def test_hold_and_continue_matches_unbroken_sequence(self, engine):
        """stage1 (held) + continuation must equal one request over the full ids."""
        ids = _prompt(1)
        engine.submit(Request(request_id="a", token_ids=ids, images=[],
                              max_tokens=6, hold_slot=True))
        engine.run_until_idle()
        c1 = engine.get_completion("a", timeout=5)
        assert "a" in engine.held
        chunk = [7, 8, 9]
        engine.submit_continuation(Continuation(
            parent_request_id="a", request_id="a2", chunk_ids=chunk, images=[],
            kept_tokens=len(c1.token_ids), max_tokens=5,
        ))
        engine.run_until_idle()
        c2 = engine.get_completion("a2", timeout=5)

        # oracle: single request over prompt + generated + chunk
        full = ids + c1.token_ids + chunk
        engine.submit(Request(request_id="full", token_ids=full, images=[], max_tokens=5))
        engine.run_until_idle()
        ref = engine.get_completion("full", timeout=5)
        assert c2.token_ids == ref.token_ids

    def test_release_slot_frees_capacity(self, engine):
        ids = _prompt(2)
        engine.submit(Request(request_id="h", token_ids=ids, images=[],
                              max_tokens=3, hold_slot=True))
        engine.run_until_idle()
        engine.get_completion("h", timeout=5)
        assert "h" in engine.held
        engine.release_slot("h")
        assert "h" not in engine.held
        # both slots free again: two concurrent requests fit
        for i in range(2):
            engine.submit(Request(request_id=f"r{i}", token_ids=_prompt(3 + i), images=[], max_tokens=3))
        engine.run_until_idle()
        assert engine.get_completion("r0", timeout=5)

    def test_continuation_before_parent_finishes_defers(self, engine):
        ids = _prompt(4, n=12)
        engine.submit(Request(request_id="p", token_ids=ids, images=[],
                              max_tokens=8, hold_slot=True))
        # submit the continuation immediately — parent not yet complete
        engine.submit_continuation(Continuation(
            parent_request_id="p", request_id="p2", chunk_ids=[5, 6],
            images=[], kept_tokens=10**9, max_tokens=4,
        ))
        engine.run_until_idle()
        c2 = engine.get_completion("p2", timeout=5)
        assert isinstance(c2.token_ids, list)


def test_run_episodes_served_pipelined(monkeypatch):
    """Full pipelined episode serving on the tiny model (forced bbox)."""
    from zoomearth_tpu.serve import episodes as EP

    monkeypatch.setattr(
        EP, "extract_bboxes", lambda text, scale=1.0: [[50, 50, 120, 120]]
    )
    params = init_vlm_params(jax.random.key(1), CFG)
    engine = ServingEngine(
        params, CFG, max_slots=2, max_seq_len=512, decode_chunk=2,
        cache_dtype="float32", length_buckets=(256, 512), patch_buckets=(0, 16, 64),
    )
    proc = Processor(FakeTokenizer(CFG.tokens), CFG, max_pixels=4 * 28 * 28)
    rng = np.random.default_rng(0)
    imgs = [Image.fromarray(rng.integers(0, 255, (700, 700, 3), dtype=np.uint8)) for _ in range(3)]
    engine.start()
    try:
        results = run_episodes_served(
            engine, proc, ["q1?", "q2?", "q3?"], imgs,
            max_new_tokens=5,
            prompt_fn=lambda q: PT.PREFIX + q + "\nGo.<|im_end|><|im_start|>assistant\n",
        )
    finally:
        engine.stop()
    assert len(results) == 3
    for r in results:
        assert r is not None and not r.error
        assert isinstance(r.stage2, str) and r.stage2 != ""
        assert r.bbox == [50, 50, 120, 120]  # the patched extractor ignores scale
