"""InternVL anyres tiling parity tests (vs the reference algorithm semantics)."""

import numpy as np
import pytest
from PIL import Image

from zoomearth_tpu.image.anyres import (
    dynamic_preprocess,
    find_closest_aspect_ratio,
    load_image_anyres,
    normalize_imagenet,
)


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


def test_square_image_single_tile():
    tiles = dynamic_preprocess(_img(448, 448), max_num=12, image_size=448)
    assert len(tiles) == 1 and tiles[0].size == (448, 448)


def test_wide_image_tiles_horizontally():
    tiles = dynamic_preprocess(_img(1800, 450), max_num=12, image_size=448)
    # aspect 4:1 -> 4x1 tiling
    assert len(tiles) == 4
    assert all(t.size == (448, 448) for t in tiles)


def test_thumbnail_appended():
    tiles = dynamic_preprocess(_img(1800, 450), max_num=12, image_size=448, use_thumbnail=True)
    assert len(tiles) == 5  # 4 tiles + thumbnail
    tiles1 = dynamic_preprocess(_img(448, 448), max_num=12, image_size=448, use_thumbnail=True)
    assert len(tiles1) == 1  # no thumbnail when single tile


def test_max_num_respected():
    tiles = dynamic_preprocess(_img(5000, 5000), max_num=6, image_size=448)
    assert 1 <= len(tiles) <= 6


def test_closest_aspect_ratio_tiebreak():
    ratios = [(1, 1), (2, 2)]
    # large area prefers the bigger grid on ties
    assert find_closest_aspect_ratio(1.0, ratios, 2000, 2000, 448) == (2, 2)
    assert find_closest_aspect_ratio(1.0, ratios, 100, 100, 448) == (1, 1)


def test_load_image_anyres_shape_and_normalization():
    pv = load_image_anyres(_img(900, 450), input_size=448, max_num=12)
    assert pv.ndim == 4 and pv.shape[1:] == (3, 448, 448)
    # ImageNet normalization: mean-ish zero for random uint8
    assert abs(float(pv.mean())) < 0.6


def test_normalize_imagenet_values():
    img = Image.new("RGB", (4, 4), (124, 116, 104))  # ~ImageNet mean * 255
    out = normalize_imagenet(img)
    assert np.abs(out).max() < 0.05
