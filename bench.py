"""Benchmark: two-stage zoom-QA episode throughput on one TPU chip.

Models the LRS-GRO eval workload (BASELINE.json north star: queries/sec/chip):
flagship Qwen2.5-VL-3B config, bf16, batch of 8 episodes per wave —
  stage 1: 5000px tile -> host resize to 512px -> preprocess -> prefill(~700 tok incl.
           324 image tokens) -> decode 160 tokens (no early stop: random weights;
           real runs EOS earlier, so this is worst-case decode work)
  stage 2: host crop (512px window from the full-res tile) -> preprocess -> prefill
           (~1180 tok incl. 2 images) -> decode 96 tokens
Host preprocessing is measured inside the loop (it is part of the product latency).

Weight values are random (no checkpoint on disk); throughput is value-independent.
vs_baseline uses an ESTIMATED A100 vLLM reference of 2.0 q/s/GPU for the same episode
shape (the reference publishes no throughput numbers — BASELINE.md; replace with a
measured figure when available).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BATCH = 8
STAGE1_NEW = 160
STAGE2_NEW = 96
WAVES = 3  # timed waves (after one warmup/compile wave)
A100_VLLM_BASELINE_QPS = 2.0  # documented estimate, see module docstring


def synthetic_tile(seed, size=5000):
    rng = np.random.default_rng(seed)
    # Low-entropy synthetic "satellite tile" (constant blocks compress PIL work
    # realistically vs pure noise)
    small = rng.integers(0, 255, (50, 50, 3), dtype=np.uint8)
    return np.kron(small, np.ones((size // 50, size // 50, 1), dtype=np.uint8))


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from zoomearth_tpu.config import VLMConfig
    from zoomearth_tpu.image.geometry import cut_image, resize_image_with_scale
    from zoomearth_tpu.image.preprocess import preprocess_image
    from zoomearth_tpu.models.rope import mrope_position_ids_batch
    from zoomearth_tpu.runtime.generate import GenerationConfig, Generator, PreparedBatch, bucket, prepare_batch
    from __graft_entry__ import _zero_params

    cfg = VLMConfig.qwen2_5_vl_3b()
    tok = cfg.tokens
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    params = _zero_params(cfg, jnp.bfloat16)
    gen = Generator(params, cfg, max_cache_len=2048, cache_dtype=jnp.bfloat16)

    tiles = [Image.fromarray(synthetic_tile(i)) for i in range(BATCH)]
    rng = np.random.default_rng(0)

    def build_stage1(tiles):
        token_lists, images = [], []
        for t in tiles:
            small, _scale = resize_image_with_scale(t, 512)
            pv, grid = preprocess_image(small, max_pixels=512 * 512)
            n_img = (grid[0] * grid[1] * grid[2]) // cfg.vision.merge_unit
            ids = (
                [tok.im_start] + list(rng.integers(100, 100000, size=20))
                + [tok.vision_start] + [tok.image_pad] * n_img + [tok.vision_end]
                + list(rng.integers(100, 100000, size=350))  # ~instruction length
            )
            token_lists.append(ids)
            images.append([(pv, grid)])
        return prepare_batch(cfg, token_lists, images), token_lists, images

    def build_stage2(tiles, token_lists, images):
        token_lists2, images2 = [], []
        for t, ids, imgs in zip(tiles, token_lists, images):
            # synthesize the bbox the model "chose" and crop from full-res
            bbox = [2200, 2200, 2380, 2350]
            crop, _ = resize_image_with_scale(cut_image(t, bbox, 512), 512)
            pv2, grid2 = preprocess_image(crop, max_pixels=512 * 512)
            n2 = (grid2[0] * grid2[1] * grid2[2]) // cfg.vision.merge_unit
            ids2 = (
                list(ids) + list(rng.integers(100, 100000, size=STAGE1_NEW))
                + [tok.vision_start] + [tok.image_pad] * n2 + [tok.vision_end]
            )
            token_lists2.append(ids2)
            images2.append(imgs + [(pv2, grid2)])
        return prepare_batch(cfg, token_lists2, images2)

    g1 = GenerationConfig(max_new_tokens=STAGE1_NEW, temperature=0.01)
    g2 = GenerationConfig(max_new_tokens=STAGE2_NEW, temperature=0.01)

    def run_wave(seed):
        b1, tl, im = build_stage1(tiles)
        out1 = gen.generate(b1, g1, seed=seed)
        b2 = build_stage2(tiles, tl, im)
        out2 = gen.generate(b2, g2, seed=seed + 1)
        return out1, out2

    t0 = time.time()
    run_wave(0)  # warmup + compile
    print(f"warmup (incl. compile): {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for w in range(WAVES):
        run_wave(w + 1)
    dt = time.time() - t0
    qps = BATCH * WAVES / dt
    print(f"{WAVES} waves x {BATCH} episodes in {dt:.2f}s", file=sys.stderr)

    print(json.dumps({
        "metric": "LRS-GRO-shaped zoom-QA episodes/sec/chip (3B bf16, 2-stage, batch 8)",
        "value": round(qps, 3),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / A100_VLLM_BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
