"""Interactive demo: single-image two-stage zoom-QA (reference src/demo.py surface).

Usage: python -m zoomearth_tpu.cli.demo --model MODEL_DIR --image IMG --prompt "..."
"""

from __future__ import annotations

import argparse

from PIL import Image

from ..agent.episode import run_episodes
from ..runtime.generate import GenerationConfig, Generator
from .common import load_model_and_processor


def main(argv=None):
    p = argparse.ArgumentParser(description="ZoomEarth-TPU demo: two-stage zoom QA")
    p.add_argument("--model", required=True, help="local HF checkpoint directory")
    p.add_argument("--image", required=True)
    p.add_argument("--prompt", default="Are there any building on the top-right island?")
    p.add_argument("--max_new_tokens", type=int, default=1024)
    p.add_argument("--stage1_max_size", type=int, default=1024)  # demo.py:132 uses 1024
    args = p.parse_args(argv)

    params, cfg, processor = load_model_and_processor(args.model)
    generator = Generator(params, cfg, max_cache_len=4096)
    image = Image.open(args.image).convert("RGB")
    (result,) = run_episodes(
        generator, processor, [args.prompt], [image],
        stage1_max_size=args.stage1_max_size,
        gen=GenerationConfig(max_new_tokens=args.max_new_tokens, temperature=0.0),
    )
    # demo.py prints stage-2 output when a crop happened, else stage-1 (demo.py:137-146)
    print(result.stage2 if not result.error else result.stage1)


if __name__ == "__main__":
    main()
