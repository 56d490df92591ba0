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

    @property
    def answer(self) -> Optional[str]:
        return self.answer2 if self.answer2 is not None else self.answer1


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
) -> List[EpisodeResult]:
    """Run one batched two-stage episode per (question, full-res image) pair."""
    cfg = generator.cfg
    tk = processor.tokenizer

    # ---- stage 1: downsampled full image ----------------------------------
    stage1_texts = [PT.stage1_prompt(q) for q in questions]
    resized, scales = [], []
    for img in images:
        small = resize_image(img, stage1_max_size)
        resized.append(small)
        scales.append(max(img.width, img.height) / max(small.width, small.height))
    encoded = [processor.encode(t, [im]) for t, im in zip(stage1_texts, resized)]
    batch = prepare_batch(cfg, [ids for ids, _ in encoded], [imgs for _, imgs in encoded])
    out_tokens = generator.generate(batch, gen, seed=seed)
    stage1_out = [tk.decode(t).strip() for t in out_tokens]

    # ---- stage 2: crop + continue, batched over samples with a bbox -------
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
        out2_tokens = generator.generate(batch2, gen, seed=seed + 1)
        for j, i in enumerate(s2_idx):
            out2 = tk.decode(out2_tokens[j]).strip()
            r = results[i]
            results[i] = dataclasses.replace(r, stage2=out2, answer2=extract_answer(out2))
    return results  # type: ignore[return-value]
