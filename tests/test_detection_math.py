"""Detection reward family + MATH equivalence tests."""

import pytest

from zoomearth_tpu.rewards import detection as D
from zoomearth_tpu.rewards.generic import accuracy_reward
from zoomearth_tpu.utils import mathcheck as M


def _boxes_json(boxes):
    import json

    return "```json" + json.dumps(boxes) + "```"


CAR = {"bbox_2d": [0, 0, 100, 100], "label": "car"}
CAR_SHIFT = {"bbox_2d": [10, 0, 110, 100], "label": "car"}
SHIP = {"bbox_2d": [200, 200, 300, 300], "label": "ship"}


class TestMap:
    def test_perfect_match_map1(self):
        assert D.calculate_map([CAR, SHIP], [CAR, SHIP]) == pytest.approx(1.0)

    def test_map50_vs_map(self):
        # ~0.82 IoU: counts at 0.5..0.8 thresholds, misses above
        m50 = D.calculate_map([CAR_SHIFT], [CAR], score_type=1)
        m = D.calculate_map([CAR_SHIFT], [CAR], score_type=0)
        assert m50 == pytest.approx(1.0)
        assert 0.3 < m < 1.0

    def test_unknown_pred_label_dropped(self):
        assert D.calculate_map([{"bbox_2d": [0, 0, 100, 100], "label": "dog"}], [CAR]) == 0.0

    def test_map_reward_parsing(self):
        assert D.map_reward(_boxes_json([CAR]), _boxes_json([CAR])) == pytest.approx(1.0)
        assert D.map_reward("no json", "no json") == 1.0  # both empty
        assert D.map_reward("no json", _boxes_json([CAR])) == 0.0

    def test_length_penalty(self):
        r = D.map_reward(_boxes_json([CAR, SHIP, CAR_SHIFT]), _boxes_json([CAR]),
                         length_reward=True)
        # over-prediction: factor 1/3
        assert r <= 1 / 3 + 1e-9


class TestOd:
    def test_od_none_none(self):
        assert D.od_reward("<answer>None</answer>", "<answer>None</answer>") == 1.0

    def test_od_with_boxes(self):
        c = "<answer>" + _boxes_json([CAR]) + "</answer>"
        assert D.od_reward(c, c) == pytest.approx(1.0)

    def test_od_no_prediction(self):
        assert D.od_reward("nothing", "<answer>None</answer>") == 0.0


class TestDetectionScore:
    def test_perfect(self):
        c = "<answer>" + _boxes_json([CAR, SHIP]) + "</answer>"
        assert D.detection_score(c, c) == pytest.approx(1.0, abs=1e-6)

    def test_empty_gt(self):
        assert D.detection_score("<answer>x</answer>", "<answer>y</answer>") == 1.0
        c = "<answer>" + _boxes_json([CAR]) + "</answer>"
        assert D.detection_score(c, "<answer>none</answer>") == 0.0

    def test_partial_missed(self):
        pred = "<answer>" + _boxes_json([CAR]) + "</answer>"
        gt = "<answer>" + _boxes_json([CAR, SHIP]) + "</answer>"
        score = D.detection_score(pred, gt)
        assert 0.0 < score < 1.0

    def test_wrong_label_zeroes_position(self):
        pred = "<answer>" + _boxes_json([{"bbox_2d": [0, 0, 100, 100], "label": "dog"}]) + "</answer>"
        gt = "<answer>" + _boxes_json([CAR]) + "</answer>"
        # matched geometrically but label wrong: position contribution zeroed
        score = D.detection_score(pred, gt)
        assert score == pytest.approx(0.3 * 1.0 / 1.0, abs=1e-6)  # only completeness


class TestAccuracyDispatch:
    def test_detection_methods_wired(self):
        c = "<answer>" + _boxes_json([CAR]) + "</answer>"
        out = accuracy_reward([c], [c], accu_reward_method=["od_ap"])
        assert out == [pytest.approx(1.0)]

    def test_math_method(self):
        out = accuracy_reward(
            ["<answer>\\boxed{\\frac{1}{2}}</answer>"], ["<answer>1/2</answer>"],
            accu_reward_method=["math"],
        )
        assert out == [1.0]


class TestMathEquiv:
    def test_boxed_extraction(self):
        assert M.remove_boxed("\\boxed{42}") == "42"
        assert M.last_boxed_only_string("so \\boxed{1+x} done") == "\\boxed{1+x}"
        assert M.last_boxed_only_string("none here") is None

    def test_frac_normalization(self):
        assert M.is_equiv("\\frac12", "\\frac{1}{2}")
        assert M.is_equiv("1/2", "\\frac{1}{2}")
        assert M.is_equiv("0.5", "\\frac{1}{2}")

    def test_sqrt_and_units(self):
        assert M.is_equiv("\\sqrt2", "\\sqrt{2}")
        assert M.is_equiv("5 \\text{ meters}", "5")

    def test_compute_score(self):
        assert M.compute_score("The answer is \\boxed{3/4}", "\\frac{3}{4}") == 1.0
        assert M.compute_score("7", "8") == 0.0
        assert M.compute_score("x=5", "5") == 1.0
