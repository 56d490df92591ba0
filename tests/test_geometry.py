"""Unit tests for the shared image-geometry module (crop windows, bbox parsing, IoU).

Covers the clamping edge cases of the reference's cut_image (demo.py:30-70) that the
Region-Guided reward and eval parity depend on.
"""

import numpy as np
import pytest
from PIL import Image

from zoomearth_tpu.image import geometry as G


class TestCropWindow:
    def test_large_box_passthrough(self):
        assert G.crop_window([100, 200, 700, 800], 5000, 5000) == (100, 200, 700, 800)

    def test_small_box_expanded_to_min_size(self):
        x1, y1, x2, y2 = G.crop_window([1000, 1000, 1100, 1100], 5000, 5000)
        assert (x2 - x1, y2 - y1) == (512, 512)
        # Centred on the box centre (1050, 1050)
        assert x1 == 1050 - 256 and y1 == 1050 - 256

    def test_small_box_near_origin_shifts_inside(self):
        x1, y1, x2, y2 = G.crop_window([0, 0, 50, 50], 5000, 5000)
        assert (x1, y1) == (0, 0)
        assert (x2, y2) == (512, 512)

    def test_small_box_near_far_edge_shifts_inside(self):
        x1, y1, x2, y2 = G.crop_window([4950, 4950, 4990, 4990], 5000, 5000)
        assert (x2, y2) == (5000, 5000)
        assert (x1, y1) == (4488, 4488)

    def test_image_smaller_than_min_size(self):
        x1, y1, x2, y2 = G.crop_window([10, 10, 50, 50], 300, 300)
        assert (x1, y1) == (0, 0)
        assert (x2, y2) == (300, 300)

    def test_one_thin_dimension_expands(self):
        x1, y1, x2, y2 = G.crop_window([1000, 1000, 2000, 1010], 5000, 5000)
        # width >= 512 but height < 512 → whole box re-centred at min_size square
        assert (x2 - x1, y2 - y1) == (512, 512)

    def test_matches_pil_cut_image(self):
        img = Image.new("RGB", (1024, 768))
        for bbox in ([0, 0, 30, 30], [500, 400, 600, 500], [100, 100, 900, 700]):
            crop = G.cut_image(img, bbox)
            win = G.crop_window(bbox, 1024, 768)
            assert crop.size == (win[2] - win[0], win[3] - win[1])


class TestResize:
    def test_downscale(self):
        assert G.resized_size(5000, 4000, 1024) == (1024, int(4000 * (1024 / 5000)))

    def test_no_upscale(self):
        assert G.resized_size(800, 600, 1024) == (800, 600)

    def test_min_side_floor(self):
        # customized_funcs.py:76-85: min side floored at 30px
        w, h = G.resized_size(2000, 40, 512, min_side=30)
        assert h >= 30

    def test_scale_factor_roundtrip(self):
        img = Image.new("RGB", (5000, 3000))
        resized, inv = G.resize_image_with_scale(img, 512)
        assert resized.size[0] == 512
        assert inv == pytest.approx(5000 / 512)


class TestBboxParsing:
    def test_extract_single(self):
        text = 'I see it. {"bbox_2d": [10, 20, 30, 40]}'
        assert G.extract_bbox(text) == [10, 20, 30, 40]

    def test_extract_scaled(self):
        text = '"bbox_2d": [10, 20, 30, 40]'
        assert G.extract_bbox(text, scale=2.5) == [25.0, 50.0, 75.0, 100.0]

    def test_extract_multiple_takes_first(self):
        text = '"bbox_2d": [1,2,3,4] and "bbox_2d": [5,6,7,8]'
        assert G.extract_bbox(text) == [1, 2, 3, 4]
        assert len(G.extract_bboxes(text)) == 2

    def test_non_integer_skipped(self):
        assert G.extract_bbox('"bbox_2d": [a, b, c, d]') is None

    def test_no_bbox(self):
        assert G.extract_bbox("<think>no box needed</think>") is None

    def test_parse_bbox_json_strict(self):
        assert G.parse_bbox_json('x {"bbox_2d": [1, 2, 3, 4], "label": "car"} y') == [1, 2, 3, 4]

    def test_answer_extraction(self):
        assert G.extract_answer("<think>hm</think><answer> ship </answer>") == "ship"
        assert G.extract_answer("no tags") is None


class TestBoxMath:
    def test_iou_identity(self):
        assert G.box_iou([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)

    def test_iou_disjoint(self):
        assert G.box_iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0

    def test_iou_half(self):
        assert G.box_iou([0, 0, 10, 10], [0, 5, 10, 15]) == pytest.approx(1 / 3)

    def test_center_distance(self):
        assert G.center_distance([0, 0, 10, 10], [10, 0, 20, 10]) == pytest.approx(10.0)
