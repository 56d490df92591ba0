"""Shared CLI plumbing: model/processor loading from an HF checkpoint directory."""

from __future__ import annotations

import os
import sys


def load_model_and_processor(model_path: str, *, max_pixels=None, min_pixels=None, dtype=None):
    """Load (params, cfg, processor) from a local HF Qwen2.5-VL checkpoint dir."""
    from ..agent.processor import Processor
    from ..config import VLMConfig
    from ..models.params import load_hf_checkpoint
    from ..tokenizer import HFTokenizer

    if not os.path.isdir(model_path):
        sys.exit(
            f"model path {model_path!r} is not a directory — expected a local HF "
            "checkpoint (config.json + *.safetensors + tokenizer files)"
        )
    cfg = VLMConfig.from_hf_dir(model_path)
    params = load_hf_checkpoint(model_path, cfg, dtype=dtype)
    tokenizer = HFTokenizer(model_path)
    processor = Processor(tokenizer, cfg, min_pixels=min_pixels, max_pixels=max_pixels)
    return params, cfg, processor
