"""Tests for the processor (image-pad expansion, SFT label masking) and the two-stage
episode driver (scripted generator for control flow; tiny real model for smoke)."""

import numpy as np
import pytest
from PIL import Image

from zoomearth_tpu.agent import prompts as PT
from zoomearth_tpu.agent.episode import run_episodes
from zoomearth_tpu.agent.processor import IGNORE_INDEX, Processor
from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.runtime.generate import GenerationConfig
from zoomearth_tpu.tokenizer import FakeTokenizer

CFG = VLMConfig.tiny()


@pytest.fixture
def processor():
    return Processor(FakeTokenizer(CFG.tokens), CFG, max_pixels=16 * 28 * 28)


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


class TestProcessor:
    def test_expand_image_pads(self, processor):
        ids, prepped = processor.encode("a<|vision_start|><|image_pad|><|vision_end|>b", [_img(128, 128)])
        grid = prepped[0][1]
        n = (grid[0] * grid[1] * grid[2]) // 4
        assert ids.count(CFG.tokens.image_pad) == n
        # structure preserved: a, vision_start, pads, vision_end, b
        assert ids[0] == processor.tokenizer.encode("a")[0]
        assert ids[1] == CFG.tokens.vision_start
        assert ids[-2] == CFG.tokens.vision_end

    def test_placeholder_count_mismatch_raises(self, processor):
        with pytest.raises(ValueError):
            processor.encode("no placeholder", [_img(64, 64)])

    def test_labels_mask_prompt_and_images(self, processor):
        prompt = "q:<|vision_start|><|image_pad|><|vision_end|>"
        target = "<think>t</think><|vision_start|><|image_pad|><|vision_end|><answer>x</answer>"
        ids, labels, prepped = processor.encode_with_labels(prompt, target, [_img(64, 64, 1), _img(64, 64, 2)])
        assert len(ids) == len(labels)
        n_prompt = len(processor.expand_image_pads(
            processor.tokenizer.encode(prompt), [prepped[0][1]]
        ))
        # prompt fully masked
        assert all(l == IGNORE_INDEX for l in labels[:n_prompt])
        # target: image tokens masked, text tokens = ids
        tgt_ids, tgt_labels = ids[n_prompt:], labels[n_prompt:]
        for i, l in zip(tgt_ids, tgt_labels):
            if i == CFG.tokens.image_pad:
                assert l == IGNORE_INDEX
            else:
                assert l == i
        # at least some supervised tokens exist
        assert sum(l != IGNORE_INDEX for l in labels) > 0


class ScriptedGenerator:
    """Generator stub returning pre-scripted decoded texts (encoded via tokenizer)."""

    def __init__(self, tokenizer, script):
        self.cfg = CFG
        self.tokenizer = tokenizer
        self.script = list(script)  # list of lists of strings, one per generate() call
        self.calls = []

    def generate(self, batch, gen=None, seed=0):
        self.calls.append(batch)
        texts = self.script.pop(0)
        assert len(texts) == batch.input_ids.shape[0]
        return [self.tokenizer.encode(t) for t in texts]


class TestEpisodeOrchestration:
    def test_two_stage_with_bbox(self, processor):
        tk = processor.tokenizer
        stage1 = '<think>desc</think> [{"bbox_2d": [10, 20, 40, 50], "label": "x"}]'
        stage2 = "<think>closer</think><answer>ship</answer>"
        g = ScriptedGenerator(tk, [[stage1], [stage2]])
        img = _img(2000, 2000)
        (r,) = run_episodes(g, processor, ["what is it?"], [img],
                            gen=GenerationConfig(max_new_tokens=16))
        assert not r.error
        assert r.answer2 == "ship" and r.answer == "ship"
        # bbox scaled back to full-res: stage1 saw 512px, scale = 2000/512
        s = 2000 / 512
        assert r.bbox == [10 * s, 20 * s, 40 * s, 50 * s]
        # stage-2 batch has two images (full downsampled + crop)
        b2 = g.calls[1]
        assert b2.pixel_values is not None
        # stage-2 prompt continues assistant turn: contains stage-1 reasoning, no <answer>
        s2_text = tk.decode(b2.input_ids[0].tolist(), skip_special_tokens=False)
        assert "<think>desc</think>" in s2_text
        assert s2_text.count("<|vision_start|>") == 2

    def test_no_bbox_marks_error(self, processor):
        stage1 = "<think>global question</think><answer>three</answer>"
        g = ScriptedGenerator(processor.tokenizer, [[stage1]])
        (r,) = run_episodes(g, processor, ["how many?"], [_img(1500, 1000)])
        assert r.error and r.stage2 == "" and r.answer1 == "three" and r.answer == "three"
        assert len(g.calls) == 1  # stage 2 skipped entirely

    def test_mixed_batch_regroups_stage2(self, processor):
        s1a = '<think>a</think>{"bbox_2d": [0, 0, 30, 30]}'
        s1b = "<think>b</think><answer>two</answer>"
        s1c = '<think>c</think>{"bbox_2d": [500, 500, 700, 800]}'
        s2 = ["<answer>car</answer>", "<answer>dock</answer>"]
        g = ScriptedGenerator(processor.tokenizer, [[s1a, s1b, s1c], s2])
        rs = run_episodes(g, processor, ["q1", "q2", "q3"], [_img(1024, 1024, i) for i in range(3)])
        assert [r.error for r in rs] == [False, True, False]
        assert rs[0].answer == "car" and rs[1].answer == "two" and rs[2].answer == "dock"
        assert g.calls[1].input_ids.shape[0] == 2  # stage-2 batched over 2 samples


def test_episode_smoke_with_real_tiny_model(monkeypatch):
    """End-to-end smoke: real tiny model through the full episode loop (random output).

    The byte-level FakeTokenizer makes the real INSTRUCTION ~2300 tokens, too slow for
    one CPU core — swap in a short template (prompt structure unchanged)."""
    import jax

    from zoomearth_tpu.models.params import init_vlm_params
    from zoomearth_tpu.runtime.generate import Generator

    monkeypatch.setattr(
        PT, "stage1_prompt",
        lambda q: PT.PREFIX + q + "\nAnswer.<|im_end|><|im_start|>assistant\n",
    )
    params = init_vlm_params(jax.random.key(0), CFG)
    g = Generator(params, CFG, max_cache_len=512, cache_dtype="float32")
    proc = Processor(FakeTokenizer(CFG.tokens), CFG, max_pixels=4 * 28 * 28)
    rs = run_episodes(
        g, proc, ["what?"], [_img(600, 600)],
        gen=GenerationConfig(max_new_tokens=4, temperature=0.0),
    )
    assert len(rs) == 1 and isinstance(rs[0].stage1, str)
