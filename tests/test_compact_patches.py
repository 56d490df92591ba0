"""Compact (single-frame) patch upload: half the host->device bytes, same embeddings.

A still image's conv3d patches repeat the frame along the temporal axis
(HF Qwen2VLImageProcessor._preprocess), so x_dup @ K == x_compact @ (sum of K's
temporal row-slices). preprocess_image_u8(compact=True) emits the narrow patches;
vit_forward folds the patch-embed kernel when it sees the narrow width.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.image.preprocess import preprocess_image_u8
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.models.vit import vision_metadata
from zoomearth_tpu.models.vlm import compute_vision_embeds, vision_meta_to_device


def _rand_image(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8))


def test_compact_patch_bytes_and_grid():
    img = _rand_image(224, 168)
    full, g_full = preprocess_image_u8(img)
    comp, g_comp = preprocess_image_u8(img, compact=True)
    assert g_full == g_comp
    assert comp.shape == (full.shape[0], full.shape[1] // 2)
    # compact == the first temporal frame of the full layout ([C, T, ps, ps] rows)
    per_ch = comp.shape[1] // 3
    full_r = full.reshape(full.shape[0], 3, 2, per_ch)
    np.testing.assert_array_equal(comp.reshape(comp.shape[0], 3, per_ch), full_r[:, :, 0])
    np.testing.assert_array_equal(full_r[:, :, 0], full_r[:, :, 1])  # frames identical


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_compact_embeds_match_full(dtype):
    cfg = VLMConfig.tiny()
    params = init_vlm_params(jax.random.key(0), cfg, dtype=jnp.dtype(dtype))
    img = _rand_image(4 * cfg.vision.patch_size * 2, 2 * cfg.vision.patch_size * 2, seed=3)
    full, grid = preprocess_image_u8(img, patch_size=cfg.vision.patch_size)
    comp, grid2 = preprocess_image_u8(img, patch_size=cfg.vision.patch_size, compact=True)
    assert grid == grid2
    meta = vision_meta_to_device(vision_metadata([grid], cfg.vision))
    f = jax.jit(lambda pv: compute_vision_embeds(params, cfg, pv, meta))
    e_full = np.asarray(f(jnp.asarray(full)), np.float32)
    e_comp = np.asarray(f(jnp.asarray(comp)), np.float32)
    if dtype == "float32":
        # fp32: the folded kernel differs from the duplicated matmul only by
        # accumulation order — embeddings agree to float noise
        np.testing.assert_allclose(e_comp, e_full, rtol=2e-5, atol=2e-5)
    else:
        # bf16 kernel fold rounds once; stays within bf16 dtype noise
        scale = np.abs(e_full).mean()
        assert np.abs(e_comp - e_full).mean() < 0.02 * max(scale, 1.0)
