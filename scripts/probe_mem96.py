"""Which program OOMs at batch 96? Run the bench's stage sequence piecewise.

Stages: weights+cache alloc -> stage-1 ViT embed cache -> gen1 prefill (embeds path)
-> 160-step decode -> stage-2 crop ViT+chunk prefill -> 96-step decode. Prints HBM
arithmetic and survives/ dies per stage. BENCH_BATCH-style shapes, int8 weights.
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

B = int(os.environ.get("PROBE_B", "96"))

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.image.loader import TileImage
from zoomearth_tpu.image.preprocess import preprocess_image_u8
from zoomearth_tpu.runtime.generate import GenerationConfig, Generator, prepare_batch
from zoomearth_tpu.ops.quant import fuse_decoder_matmuls, quantize_decoder_int8
from __graft_entry__ import _zero_params

sys.path.insert(0, "/root/repo")
from bench import synthetic_tile  # noqa: E402

cfg = VLMConfig.qwen2_5_vl_3b()
tok = cfg.tokens
print(f"device: {jax.devices()[0]} B={B}", file=sys.stderr)

params = _zero_params(cfg, jnp.bfloat16)
params = fuse_decoder_matmuls(params)
params = quantize_decoder_int8(params, lm_head=True)
SPLIT = int(os.environ.get("PROBE_SPLIT", "48"))
gen = Generator(params, cfg, max_cache_len=1536,
                prefill_split_rows=SPLIT if B > SPLIT else 0)
print(f"[ok] params on device (prefill_split_rows={gen.prefill_split_rows})", flush=True)

tiles = [TileImage(synthetic_tile(i % 16)) for i in range(B)]


def resize_512(tile):
    w, h = tile.size
    scale = 512 / max(w, h)
    return tile.resize((int(w * scale), int(h * scale))) if scale < 1 else tile


prepped = [preprocess_image_u8(resize_512(t).array, max_pixels=512 * 512) for t in tiles]

from zoomearth_tpu.models.vlm import compute_vision_embeds, vision_meta_to_device
from zoomearth_tpu.models.vit import vision_metadata

t0 = time.time()
pv = np.concatenate([p for p, _ in prepped], axis=0)
grids = [g for _, g in prepped]
meta = vision_metadata(grids, cfg.vision, pad_to=pv.shape[0])
meta_dev = vision_meta_to_device(meta)
fn = jax.jit(lambda vp, x, m: compute_vision_embeds({"vision": vp}, cfg, x, m, win_mode=meta.win_mode))
embeds = fn(params["vision"], jnp.asarray(pv), meta_dev)
np.asarray(embeds[:1])
print(f"[ok] stage-1 ViT embed cache ({pv.shape[0]} patches, win_mode={meta.win_mode}) "
      f"{time.time()-t0:.0f}s", flush=True)

import dataclasses
rng = np.random.default_rng(0)
token_lists, images = [], []
for pvi, grid in prepped:
    n_img = (grid[0] * grid[1] * grid[2]) // cfg.vision.merge_unit
    ids = ([tok.im_start] + list(rng.integers(100, 100000, size=20))
           + [tok.vision_start] + [tok.image_pad] * n_img + [tok.vision_end]
           + list(rng.integers(100, 100000, size=350)))
    token_lists.append(ids)
    images.append([(pvi, grid)])
b1 = prepare_batch(cfg, token_lists, images)
b1 = dataclasses.replace(b1, pixel_values=embeds, vision_meta=None)

g1 = GenerationConfig(max_new_tokens=160, temperature=0.01)
t0 = time.time()
out1, cache = gen.generate(b1, g1, seed=0, return_cache=True)
print(f"[ok] gen1 prefill+decode {time.time()-t0:.0f}s", flush=True)

# stage 2
from zoomearth_tpu.image.geometry import crop_window
from zoomearth_tpu.runtime.generate import prepare_continuation

chunks, chunk_imgs, keep, starts = [], [], [], []
for i, t in enumerate(tiles):
    win = crop_window([2200, 2200, 2380, 2350], t.width, t.height, 512)
    crop = resize_512(t.crop(win))
    pv2, grid2 = preprocess_image_u8(crop.array, max_pixels=512 * 512)
    n2 = (grid2[0] * grid2[1] * grid2[2]) // cfg.vision.merge_unit
    chunks.append([tok.vision_start] + [tok.image_pad] * n2 + [tok.vision_end])
    chunk_imgs.append([(pv2, grid2)])
    kept = len(out1[i])
    keep.append(int(b1.lengths[i]) + kept)
    starts.append(int(b1.next_pos[i]) + kept)
bc = prepare_continuation(cfg, chunks, chunk_imgs, starts)
# crop ViT as its OWN program (bench.py run_vit pattern): transients don't stack
# on the chunk-prefill's
pv2_all = jnp.asarray(bc.pixel_values)
grids2 = [imgs[0][1] for imgs in chunk_imgs]
meta2 = vision_metadata(grids2, cfg.vision, pad_to=pv2_all.shape[0])
fn2 = jax.jit(lambda vp, x, m: compute_vision_embeds({"vision": vp}, cfg, x, m, win_mode=meta2.win_mode))
embeds2 = fn2(params["vision"], pv2_all, vision_meta_to_device(meta2))
np.asarray(embeds2[:1])
print(f"[ok] stage-2 crop ViT ({pv2_all.shape[0]} patches)", flush=True)
bc = dataclasses.replace(bc, pixel_values=embeds2, vision_meta=None)
g2 = GenerationConfig(max_new_tokens=96, temperature=0.01)
t0 = time.time()
out2 = gen.continue_generate(cache, bc, np.asarray(keep, np.int32), g2, seed=1)
print(f"[ok] stage-2 chunk prefill+decode {time.time()-t0:.0f}s", flush=True)
print("[done] all stages fit at B =", B, flush=True)
