"""Parity tests: our numpy preprocessing vs HF transformers' Qwen2VL image processor."""

import numpy as np
import pytest
from PIL import Image

from zoomearth_tpu.image import preprocess as P


def _rand_image(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8))


class TestSmartResize:
    def test_multiples_of_factor(self):
        h, w = P.smart_resize(500, 750)
        assert h % 28 == 0 and w % 28 == 0

    def test_max_pixels_respected(self):
        h, w = P.smart_resize(5000, 5000, max_pixels=512 * 512)
        assert h * w <= 512 * 512

    def test_min_pixels_respected(self):
        h, w = P.smart_resize(30, 30)
        assert h * w >= P.DEFAULT_MIN_PIXELS

    def test_extreme_aspect_raises(self):
        with pytest.raises(ValueError):
            P.smart_resize(10, 5000)


@pytest.mark.parametrize("size", [(224, 224), (500, 350), (640, 480)])
def test_parity_with_hf_image_processor(size):
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import Qwen2VLImageProcessor

    img = _rand_image(*size, seed=42)
    hf = Qwen2VLImageProcessor(min_pixels=P.DEFAULT_MIN_PIXELS, max_pixels=1024 * 28 * 28)
    out = hf(images=[img], return_tensors="np")
    pv, grid = P.preprocess_image(img, min_pixels=P.DEFAULT_MIN_PIXELS, max_pixels=1024 * 28 * 28)
    assert tuple(out["image_grid_thw"][0]) == grid
    np.testing.assert_allclose(out["pixel_values"], pv, atol=2e-5, rtol=1e-4)


def test_batch_concat():
    imgs = [_rand_image(224, 224, 1), _rand_image(336, 224, 2)]
    pv, grids = P.preprocess_images(imgs)
    assert grids.shape == (2, 3)
    assert pv.shape[0] == int(grids.prod(axis=1).sum())
    assert pv.shape[1] == 3 * 2 * 14 * 14


def test_num_vision_tokens():
    assert P.num_vision_tokens((1, 16, 16)) == 64
