"""The active-perception episode driver: batched two-stage "zoom-and-answer".

This is the product surface of ZoomEarth (reference call stack SURVEY.md §3.1/§3.4):
stage 1 sees the downsampled full image and may emit a bbox; the runtime crops the
ORIGINAL full-res image around that bbox, appends it as a second image continuing the
assistant turn, and stage 2 produces the final <answer>.

Unlike the reference (which serializes stage 2 per sample inside the GRPO trainer,
grpo_trainer.py:595-643), stage 2 here is batched — samples that produced a bbox are
regrouped into one generate call.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

from ..image.geometry import cut_image, extract_answer, extract_bboxes, resize_image
from ..runtime.generate import GenerationConfig, Generator, prepare_batch
from . import prompts as PT
from .processor import Processor


@dataclasses.dataclass
class EpisodeResult:
    question: str
    stage1: str
    stage2: str
    answer1: Optional[str]
    answer2: Optional[str]
    bbox: Optional[list]  # full-res coords of the first predicted bbox
    error: bool  # True = no bbox produced (stage 2 skipped) — reference marks these error rows
    latency_s: Optional[float] = None  # submit -> final answer (episode-serving path)

    @property
    def answer(self) -> Optional[str]:
        return self.answer2 if self.answer2 is not None else self.answer1


def split_kept_tokens(tokenizer, completion_tokens: List[int], pre_answer_text: str):
    """Longest prefix of the GENERATED tokens whose decode is a prefix of the
    pre-<answer> text, plus the residual text to re-tokenize (token-merge boundary).

    Cache-reuse needs the kept prefix to be exactly the cached token ids; the residual
    (usually empty or a fragment of one merged token) is re-encoded into the chunk so
    the stitched TEXT equals the reference's re-tokenized stage-2 prompt."""
    lo, hi = 0, len(completion_tokens)
    # binary search over monotone "decode(tokens[:k]) is a prefix of pre_answer_text"
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if pre_answer_text.startswith(tokenizer.decode(completion_tokens[:mid], skip_special_tokens=False)):
            lo = mid
        else:
            hi = mid - 1
    kept = completion_tokens[:lo]
    residual = pre_answer_text[len(tokenizer.decode(kept, skip_special_tokens=False)):]
    return kept, residual


def _stage1_inputs(generator, processor, questions, images, stage1_max_size):
    """Encode one wave's stage-1 prompts: returns (texts, resized, scales, encoded,
    prepared batch)."""
    cfg = generator.cfg
    stage1_texts = [PT.stage1_prompt(q) for q in questions]
    resized, scales = [], []
    for img in images:
        small = resize_image(img, stage1_max_size)
        resized.append(small)
        scales.append(max(img.width, img.height) / max(small.width, small.height))
    encoded = [processor.encode(t, [im]) for t, im in zip(stage1_texts, resized)]
    batch = prepare_batch(cfg, [ids for ids, _ in encoded], [imgs for _, imgs in encoded])
    return stage1_texts, resized, scales, encoded, batch


def _stage2_continuation(
    generator, processor, questions, images, stage1_texts, resized, scales,
    encoded, batch, out_tokens, crop_min_size, crop_max_size,
):
    """Build one wave's stage-2 continuation from its stage-1 tokens.

    Returns (partial results [stage2 empty], continuation batch, keep_len, inert
    mask, s2_idx). Rows without a bbox get an inert placeholder chunk (they decode
    nothing); the continuation batch always exists so wave pipelines keep a fixed
    program shape."""
    import numpy as np

    from ..runtime.generate import prepare_continuation

    cfg = generator.cfg
    tk = processor.tokenizer
    stage1_out = [tk.decode(t).strip() for t in out_tokens]
    n = len(questions)
    results: List[Optional[EpisodeResult]] = [None] * n
    s2_idx = []
    full_chunks: List[List[int]] = [[] for _ in range(n)]
    full_imgs: List[list] = [[] for _ in range(n)]
    full_keep = [0] * n
    full_start = [0] * n
    for i, out1 in enumerate(stage1_out):
        boxes = extract_bboxes(out1, scales[i])
        if not boxes:
            results[i] = EpisodeResult(
                question=questions[i], stage1=out1, stage2="",
                answer1=extract_answer(out1), answer2=None, bbox=None, error=True,
            )
            continue
        bbox = boxes[0]
        crop = resize_image(cut_image(images[i], bbox, crop_min_size), crop_max_size)
        s2_idx.append(i)
        results[i] = EpisodeResult(
            question=questions[i], stage1=out1, stage2="",
            answer1=extract_answer(out1), answer2=None, bbox=bbox, error=False,
        )
        # split on the UNSTRIPPED decode so tokens<->text stays bijective
        raw = tk.decode(out_tokens[i], skip_special_tokens=False)
        pre_text = raw.split("<answer>")[0]
        kept, residual = split_kept_tokens(tk, out_tokens[i], pre_text)
        crop_prepped = processor.preprocess_images([crop])
        chunk_ids = tk.encode(residual) if residual else []
        chunk_ids += processor.expand_image_pads(
            tk.encode(PT.VISION_TOKENS), [crop_prepped[0][1]]
        )
        full_chunks[i] = chunk_ids
        full_imgs[i] = crop_prepped
        full_keep[i] = len(encoded[i][0]) + len(kept)
        full_start[i] = int(batch.next_pos[i]) + len(kept)
    for i in range(n):
        if not full_chunks[i]:  # inert placeholder for non-s2 rows
            full_chunks[i] = [cfg.tokens.pad]
            full_keep[i] = len(encoded[i][0])
            full_start[i] = int(batch.next_pos[i])
    bc = prepare_continuation(cfg, full_chunks, full_imgs, full_start)
    inert = np.ones((n,), bool)
    inert[s2_idx] = False
    return results, bc, np.asarray(full_keep, np.int32), inert, s2_idx


def run_episodes_pipelined(
    generator: Generator,
    processor: Processor,
    waves: Sequence,  # (questions, images) pairs OR zero-arg callables returning one
    #                     (lazy tile loading: only ~2 waves of images live at once),
    #                     EQUAL batch sizes
    *,
    stage1_max_size: int = 512,
    crop_min_size: int = 512,
    crop_max_size: int = 512,
    gen: GenerationConfig = GenerationConfig(max_new_tokens=1024, temperature=0.01),
    seed: int = 0,
    stage2_gen: Optional[GenerationConfig] = None,
) -> List[List[EpisodeResult]]:
    """Pair-pipelined cache-reuse episodes over a stream of equal-size waves.

    Same semantics as run_episodes(reuse_cache=True) per wave, but wave n's stage-1
    decode runs CO-BATCHED with wave n-1's stage-2 decode in one program
    (runtime.pipeline.run_paired_waves): one per-step weight stream serves both
    stages, and the host work between stages hides under device time — the batch-eval
    throughput configuration (bench.py models exactly this runner)."""
    import dataclasses as _dc

    from ..runtime.pipeline import run_paired_waves

    state: dict = {}
    out: List[Optional[List[EpisodeResult]]] = [None] * len(waves)

    def build_stage1(w):
        entry = waves[w]
        questions, images = entry() if callable(entry) else entry
        texts, resized, scales, encoded, batch = _stage1_inputs(
            generator, processor, questions, images, stage1_max_size
        )
        state[w] = (questions, images, texts, resized, scales, encoded, batch)
        return batch

    def build_stage2(w, out1, base_lengths, base_next):
        questions, images, texts, resized, scales, encoded, batch = state[w]
        results, bc, keep, inert, s2_idx = _stage2_continuation(
            generator, processor, questions, images, texts, resized, scales,
            encoded, batch, out1, crop_min_size, crop_max_size,
        )
        state[w] = (results, s2_idx)
        return bc, keep, inert

    def on_complete(w, out1, out2):
        results, s2_idx = state.pop(w)
        tk = processor.tokenizer
        for i in s2_idx:
            text2 = tk.decode(out2[i]).strip()
            results[i] = _dc.replace(results[i], stage2=text2, answer2=extract_answer(text2))
        out[w] = results

    run_paired_waves(
        generator, len(waves), build_stage1, build_stage2,
        gen1=gen, gen2=stage2_gen or gen, seed=seed, on_complete=on_complete,
    )
    return out  # type: ignore[return-value]


def run_episodes(
    generator: Generator,
    processor: Processor,
    questions: Sequence[str],
    images: Sequence,  # PIL images at FULL resolution
    *,
    stage1_max_size: int = 512,
    crop_min_size: int = 512,
    crop_max_size: int = 512,
    gen: GenerationConfig = GenerationConfig(max_new_tokens=1024, temperature=0.01),
    seed: int = 0,
    reuse_cache: bool = False,
    stage2_gen: Optional[GenerationConfig] = None,
) -> List[EpisodeResult]:
    """Run one batched two-stage episode per (question, full-res image) pair.

    reuse_cache=True continues stage 2 from the stage-1 KV cache (prefilling only the
    second image's tokens instead of the full stitched prompt) — faster, and the
    stitched text is identical, but kept tokens are the GENERATED ids rather than the
    reference's re-tokenization, so eval-parity runs use False (the default).

    stage2_gen: stage-2 decoding config (default: same as stage 1) — the reference
    runs asymmetric budgets (stage-1 1024, infer.py:109; stage-2 800,
    customized_funcs.py MAX_TOKENS via the chat helper)."""
    cfg = generator.cfg
    tk = processor.tokenizer
    gen2 = stage2_gen or gen

    # ---- stage 1: downsampled full image ----------------------------------
    stage1_texts, resized, scales, encoded, batch = _stage1_inputs(
        generator, processor, questions, images, stage1_max_size
    )

    if reuse_cache:
        # continuation path: keep generated pre-<answer> tokens in the cache,
        # prefill only (residual text +) the crop's vision tokens. Rows not in
        # s2_idx never decode further (inert slots).
        out_tokens, stage1_cache = generator.generate(batch, gen, seed=seed, return_cache=True)
        results, bc, keep, inert, s2_idx = _stage2_continuation(
            generator, processor, questions, images, stage1_texts, resized, scales,
            encoded, batch, out_tokens, crop_min_size, crop_max_size,
        )
        if s2_idx:
            out2_all = generator.continue_generate(
                stage1_cache, bc, keep, gen2, seed=seed + 1, inert_mask=inert,
            )
            for i in s2_idx:
                out2 = tk.decode(out2_all[i]).strip()
                results[i] = dataclasses.replace(
                    results[i], stage2=out2, answer2=extract_answer(out2)
                )
        return results  # type: ignore[return-value]

    out_tokens = generator.generate(batch, gen, seed=seed)
    stage1_out = [tk.decode(t).strip() for t in out_tokens]

    # ---- stage 2: full stitched re-prefill, batched over samples with a bbox
    results: List[Optional[EpisodeResult]] = [None] * len(questions)
    s2_idx, s2_texts, s2_images = [], [], []
    for i, out1 in enumerate(stage1_out):
        boxes = extract_bboxes(out1, scales[i])
        if not boxes:
            results[i] = EpisodeResult(
                question=questions[i], stage1=out1, stage2="",
                answer1=extract_answer(out1), answer2=None, bbox=None, error=True,
            )
            continue
        bbox = boxes[0]
        crop = resize_image(cut_image(images[i], bbox, crop_min_size), crop_max_size)
        s2_idx.append(i)
        s2_texts.append(PT.stage2_prompt(stage1_texts[i], out1))
        s2_images.append([resized[i], crop])
        results[i] = EpisodeResult(
            question=questions[i], stage1=out1, stage2="",
            answer1=extract_answer(out1), answer2=None, bbox=bbox, error=False,
        )

    if s2_idx:
        encoded2 = [processor.encode(t, ims) for t, ims in zip(s2_texts, s2_images)]
        batch2 = prepare_batch(cfg, [ids for ids, _ in encoded2], [imgs for _, imgs in encoded2])
        out2_tokens = generator.generate(batch2, gen2, seed=seed + 1)
        for j, i in enumerate(s2_idx):
            out2 = tk.decode(out2_tokens[j]).strip()
            r = results[i]
            results[i] = dataclasses.replace(r, stage2=out2, answer2=extract_answer(out2))
    return results  # type: ignore[return-value]
