"""Reward-function semantics tests (format / bbox / answer + generic library)."""

import math

import pytest

from zoomearth_tpu.rewards import generic
from zoomearth_tpu.rewards.registry import REWARD_REGISTRY, get_reward_funcs
from zoomearth_tpu.rewards.wordnet_compat import correctness, synonyms_degree, wordnet_available
from zoomearth_tpu.rewards.zoomearth import (
    answer_reward,
    bbox_reward,
    crop_iou,
    format_reward,
    get_crop_area,
)

C1_BBOX = '<think>looking</think> [{"bbox_2d": [100, 100, 200, 200], "label": "car"}]'
C2_OK = "<think>closer look</think><answer>car</answer>"
C1_NOCUT = "<think>whole image</think><answer>three</answer>"


class TestFormatReward:
    def test_cut_episode_full_format(self):
        assert format_reward([C1_BBOX], [C2_OK], question=["q"]) == [1.0]

    def test_cut_episode_missing_bbox(self):
        c1 = "<think>looking</think>"
        assert format_reward([c1], [C2_OK], question=["q"]) == [0.0]

    def test_cut_episode_missing_stage2_answer(self):
        assert format_reward([C1_BBOX], ["<think>x</think>"], question=["q"]) == [0.0]

    def test_uncut_episode(self):
        assert format_reward([C1_NOCUT], [""], question=["q"]) == [1.0]
        assert format_reward(["<answer>x</answer>"], [""], question=["q"]) == [0.0]


class TestBboxReward:
    def test_no_bbox_zero(self):
        assert bbox_reward(["<think>none</think>"], [""], bbox=[[1, 2, 3, 4]], scale=[1.0], question=["q"]) == [0.0]

    def test_exact_match_two(self):
        box = [100.0, 100.0, 200.0, 200.0]
        r = bbox_reward([C1_BBOX], [""], bbox=[box], scale=[1.0], question=["q"])
        assert r == [2.0]

    def test_iou_plus_distance(self):
        # pred [100,100,200,200] scale 2 -> [200,...,400]; ref [220,220,400,420]*scale/2=1
        ref = [220, 220, 400, 420]
        r = bbox_reward([C1_BBOX], [""], bbox=[ref], scale=[2.0], question=["q"])[0]
        pred_scaled = [200, 200, 400, 400]
        ref_scaled = [220, 220, 400, 420]
        cx, cy = 300, 300
        rx, ry = 310, 320
        dist = math.hypot(rx - cx, ry - cy) + 1e-6
        expected = crop_iou(pred_scaled, ref_scaled) + math.tanh(200 / dist)
        assert r == pytest.approx(expected, abs=1e-6)

    def test_crop_area_expansion_no_right_clamp(self):
        # small box near "edge": expanded window may exceed nominal bounds — reference
        # get_crop_area does NOT clamp right/bottom (distinct from cut_image)
        area = get_crop_area([4990, 4990, 5000, 5000])
        assert area[2] - area[0] == 512 and area[2] > 5000

    def test_crop_area_near_topleft_edge_ends_at_center_plus_half(self):
        # box centered <256px from the top/left edge: x2 comes from the UNCLAMPED
        # origin, so the window ends at center+256 and is NARROWER than min_size
        # (customized_funcs.py:150-160)
        area = get_crop_area([90, 40, 110, 60])  # center (100, 50)
        assert area == [0, 0, 100 + 256, 50 + 256]

    def test_crop_area_matches_reference_oracle(self):
        # property test vs a verbatim port of reference get_crop_area
        # (customized_funcs.py:144-162)
        import random

        def oracle(bbox, min_size=512):
            x1, y1, x2, y2 = map(int, bbox)
            width, height = x2 - x1, y2 - y1
            if width < min_size or height < min_size:
                center_x = (x1 + x2) // 2
                center_y = (y1 + y2) // 2
                new_x1 = center_x - min_size // 2
                new_y1 = center_y - min_size // 2
                new_x2 = new_x1 + min_size
                new_y2 = new_y1 + min_size
                new_x1 = max(0, new_x1)
                new_y1 = max(0, new_y1)
                return [int(new_x1), int(new_y1), int(new_x2), int(new_y2)]
            else:
                return bbox

        rng = random.Random(0)
        for _ in range(500):
            # bias toward near-edge boxes (the divergence region)
            x1 = rng.choice([rng.randint(0, 300), rng.randint(0, 4500)])
            y1 = rng.choice([rng.randint(0, 300), rng.randint(0, 4500)])
            w = rng.randint(1, 700)
            h = rng.randint(1, 700)
            box = [x1, y1, x1 + w, y1 + h]
            assert get_crop_area(box) == oracle(box), box


class TestAnswerReward:
    def test_stage2_used_when_cut(self):
        r = answer_reward([C1_NOCUT], [C2_OK], ground_truth=["car"], question=["q"])
        assert r == [1.0]

    def test_stage1_used_when_uncut(self):
        r = answer_reward([C1_NOCUT], [""], ground_truth=["three"], question=["q"])
        assert r == [1.0]

    def test_wrong_answer(self):
        r = answer_reward(["<answer>xyzzy</answer>"], [""], ground_truth=["bridge"], question=["q"])
        assert r[0] < 0.8


class TestCorrectness:
    def test_exact(self):
        assert correctness("Ship.", "ship") == 1

    def test_empty_gt(self):
        assert correctness("x", "") == 0

    def test_synonym_backend(self):
        # either backend should give full credit for these
        deg = synonyms_degree("car", "automobile")
        assert deg == 1

    def test_plural_lemmatization(self):
        assert correctness("cars", "car") == 1


class TestGeneric:
    def test_mcq(self):
        assert generic.mcq_reward("<answer>B</answer>", "<answer>B. a house</answer>") == 1.0
        assert generic.mcq_reward("<answer>A</answer>", "<answer>B</answer>") == 0.0

    def test_yes_no(self):
        assert generic.yes_no_reward("<answer>Yes, it is</answer>", "yes") == 1.0
        assert generic.yes_no_reward("<answer>no</answer>", "yes") == 0.0

    def test_default_accuracy_numeric(self):
        assert generic.default_accuracy_reward("<answer>3.0</answer>", "<answer>3</answer>") == 1.0

    def test_think_answer_format(self):
        good = "<think>a</think><answer>b</answer>"
        assert generic.think_answer_format_reward([good, "bad"]) == [1.0, 0.0]

    def test_cosine_length(self):
        short_ok = generic.cosine_length_reward("x", gen_len=10, acc_reward=1.0)
        long_ok = generic.cosine_length_reward("x", gen_len=1000, acc_reward=1.0)
        assert short_ok > long_ok  # correct answers: shorter is better

    def test_repetition(self):
        clean = generic.repetition_penalty_reward("a b c d e f g h")
        loopy = generic.repetition_penalty_reward("a b c a b c a b c a b c")
        assert clean == 0.0 and loopy < -0.3


class TestRegistry:
    def test_reference_names_present(self):
        fns = get_reward_funcs(["answer", "iou", "format"])
        assert len(fns) == 3

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_reward_funcs(["nope"])

    def test_registry_callables_run(self):
        for name, fn in REWARD_REGISTRY.items():
            # internvl_iou parses the solution as a JSON bbox OUTSIDE its try block
            # (reference semantics: malformed ground truth raises, it is a data bug)
            solution = (
                "<answer>[1, 2, 3, 4]</answer>" if name.startswith("internvl")
                else "<answer>three</answer>"
            )
            out = fn(
                [C1_NOCUT], [""],
                ground_truth=["three"], bbox=[[1, 2, 3, 4]], scale=[1.0],
                question=["q"], solution=[solution],
            )
            assert isinstance(out, list) and len(out) == 1, name


def test_debug_logging(tmp_path, monkeypatch):
    """DEBUG_MODE writes per-reward log files (reference regression harness)."""
    monkeypatch.setenv("DEBUG_MODE", "true")
    monkeypatch.setenv("LOG_PATH", str(tmp_path / "log"))
    format_reward([C1_NOCUT], [""], question=["q"])
    assert (tmp_path / "log_format.txt").exists()
    content = (tmp_path / "log_format.txt").read_text()
    assert "format reward: 1.0" in content
