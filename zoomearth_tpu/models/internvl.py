"""InternVL family glue: prompts, image-token expansion, embeds-input generation.

TPU-native counterpart of the reference's InvernVLModule (vlm_modules/
internvl_module.py:17-341): conversation templating (prepare_prompt), `<image>` ->
<img><IMG_CONTEXT>*N</img> expansion (prepare_model_inputs :100-110), anyres tiling
(dynamic_preprocess — lives in image/anyres.py), and is_embeds_input generation: the
InternViT tower runs as its own jitted program and the decoder consumes the merged
embeddings (models/internvit.py + Generator's embeds path).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import InternVLVLMConfig
from ..image.anyres import load_image_anyres
from ..runtime.generate import (
    DEFAULT_LENGTH_BUCKETS,
    GenerationConfig,
    Generator,
    PreparedBatch,
    bucket,
)
from .internvit import internvit_embeds, patchify_tiles

IMG_START_TOKEN = "<img>"
IMG_END_TOKEN = "</img>"
IMG_CONTEXT_TOKEN = "<IMG_CONTEXT>"

SYSTEM_MESSAGE = (
    "你是书生·万象, an AI assistant whose name is InternVL."
)


def chat_prompt(question: str, system_message: str = SYSTEM_MESSAGE, n_images: int = 1) -> str:
    """Qwen2-chat conversation template (InternVL3's conv_template rendered the way
    reference prepare_prompt does: system turn + user turn + empty assistant turn;
    each image becomes an '<image>\\n' marker, internvl_module.py:264-268)."""
    image_markers = "<image>\n" * n_images
    return (
        f"<|im_start|>system\n{system_message}<|im_end|>\n"
        f"<|im_start|>user\n{image_markers}{question}<|im_end|>\n"
        f"<|im_start|>assistant\n"
    )


def expand_image_tokens(text: str, tiles_per_image: Sequence[int], num_image_token: int) -> str:
    """Replace each `<image>` with <img> + <IMG_CONTEXT> * N_tile * tokens + </img>
    (reference prepare_model_inputs, internvl_module.py:100-110)."""
    for n_tiles in tiles_per_image:
        image_tokens = IMG_START_TOKEN + IMG_CONTEXT_TOKEN * (num_image_token * n_tiles) + IMG_END_TOKEN
        text = text.replace("<image>", image_tokens, 1)
    if "<image>" in text:
        raise ValueError("more <image> markers than images")
    return text


def get_question_template(task_type: str = "rec") -> str:
    """The InternVL REC question template (internvl_module.py:154-156)."""
    return (
        'Given the question: "{Question}", please provide the bounding box where you '
        "can find the asnwer to the question. First output the thinking process in "
        "<think> </think> tags and then output the final answer (the bbox) in "
        "<answer> </answer> tags. Output the bounding box of that region as pixel "
        "coordinates in the form <bbox>[x1,y1,x2,y2]</bbox>. Use integers, no spaces"
    )


def prepare_internvl_batch(
    cfg: InternVLVLMConfig,
    token_lists: Sequence[Sequence[int]],
    vision_embeds: Optional[jnp.ndarray],
    *,
    length_buckets: Sequence[int] = DEFAULT_LENGTH_BUCKETS,
) -> PreparedBatch:
    """Pack prompts + PRECOMPUTED vision embeddings into a PreparedBatch.

    InternVL uses plain sequential positions (no M-RoPE): every rotary plane carries
    arange, which reduces exactly to 1D RoPE under any mrope_section split."""
    B = len(token_lists)
    lengths = np.asarray([len(t) for t in token_lists], dtype=np.int32)
    S = bucket(int(lengths.max()), length_buckets)
    ids = np.full((B, S), cfg.tokens.pad, dtype=np.int32)
    for b, toks in enumerate(token_lists):
        ids[b, : len(toks)] = toks
    pos = np.broadcast_to(np.arange(S)[None, None], (3, B, S)).copy().astype(np.int32)
    return PreparedBatch(
        input_ids=ids, lengths=lengths, position_ids=pos, next_pos=lengths.copy(),
        pixel_values=np.asarray(vision_embeds) if vision_embeds is not None else None,
        vision_meta=None,  # None + pixel_values == embeds-input (Generator._prefill)
    )


class InternVLRunner:
    """Two-piece InternVL inference: jitted InternViT embeds + the shared Generator."""

    def __init__(self, params, cfg: InternVLVLMConfig, tokenizer, *, max_cache_len: int = 4096,
                 max_anyres_num: int = 12, cache_dtype=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_anyres_num = max_anyres_num
        self.generator = Generator(params, cfg, max_cache_len=max_cache_len, cache_dtype=cache_dtype)
        self._vit_fn = jax.jit(lambda p, patches: internvit_embeds(p["vision"], cfg.vision, patches))

    def encode_images(self, images: Sequence) -> Tuple[jnp.ndarray, List[int]]:
        """PIL images -> (packed vision embeds, tiles per image) via anyres tiling."""
        all_tiles, counts = [], []
        for img in images:
            tiles = load_image_anyres(img, input_size=self.cfg.vision.image_size,
                                      max_num=self.max_anyres_num, use_thumbnail=True)
            all_tiles.append(tiles)
            counts.append(tiles.shape[0])
        packed = np.concatenate(all_tiles, axis=0)
        patches = patchify_tiles(packed, self.cfg.vision.patch_size)
        return self._vit_fn(self.params, jnp.asarray(patches)), counts

    def generate(self, questions: Sequence[str], images: Sequence,
                 gen: GenerationConfig = GenerationConfig(), *, seed: int = 0) -> List[str]:
        """Batched single-image chat generation (embeds-input path)."""
        embeds, counts = self.encode_images(images)
        nit = self.cfg.vision.num_image_token
        token_lists = []
        for q, n_tiles in zip(questions, counts):
            text = expand_image_tokens(chat_prompt(q), [n_tiles], nit)
            token_lists.append(self.tokenizer.encode(text))
        batch = prepare_internvl_batch(self.cfg, token_lists, embeds)
        out = self.generator.generate(batch, gen, seed=seed)
        return [self.tokenizer.decode(t).strip() for t in out]
