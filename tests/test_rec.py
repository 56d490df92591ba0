"""REC task tests: yaml dataset sampling, format/IoU rewards, yaml CLI config."""

import argparse
import json

import pytest

from zoomearth_tpu.cli.config import parse_with_yaml
from zoomearth_tpu.train.rec import (
    load_yaml_datasets,
    rec_format_reward,
    rec_iou_reward,
    rec_prompt,
    resize_bbox,
)


@pytest.fixture
def yaml_spec(tmp_path):
    rows1 = [{"problem": f"p{i}", "solution": f"s{i}", "image": f"im{i}.png"} for i in range(10)]
    rows2 = [{"problem": f"q{i}", "solution": f"t{i}"} for i in range(4)]
    with open(tmp_path / "a.jsonl", "w") as f:
        for r in rows1:
            f.write(json.dumps(r) + "\n")
    with open(tmp_path / "b.json", "w") as f:
        json.dump(rows2, f)
    spec = tmp_path / "data.yaml"
    spec.write_text(
        "datasets:\n"
        f"  - json_path: {tmp_path}/a.jsonl\n"
        "    sampling_strategy: first:3\n"
        f"  - json_path: {tmp_path}/b.json\n"
        "    sampling_strategy: end:50%\n"
    )
    return spec


class TestYamlDatasets:
    def test_sampling(self, yaml_spec, tmp_path):
        samples = load_yaml_datasets(str(yaml_spec), image_root="/imgs")
        assert len(samples) == 3 + 2  # first:3 + end:50% of 4
        assert samples[0].problem == "p0" and samples[2].problem == "p2"
        assert samples[3].problem == "q2"  # end:2 of [q0..q3]
        assert samples[0].image_path == "/imgs/im0.png"
        assert samples[3].image_path is None

    def test_random_sampling_deterministic_with_seed(self, yaml_spec, tmp_path):
        spec2 = tmp_path / "rand.yaml"
        spec2.write_text(
            "datasets:\n"
            f"  - json_path: {tmp_path}/a.jsonl\n"
            "    sampling_strategy: random:4\n"
        )
        a = [s.problem for s in load_yaml_datasets(str(spec2), seed=1)]
        b = [s.problem for s in load_yaml_datasets(str(spec2), seed=1)]
        assert a == b and len(a) == 4

    def test_bad_extension(self, tmp_path):
        with pytest.raises(ValueError):
            load_yaml_datasets(str(tmp_path / "x.txt"))


class TestRecRewards:
    def test_format(self):
        good = '<think>looking</think><answer>{"bbox_2d": [1, 2, 3, 4]}</answer>'
        assert rec_format_reward([good, "<answer>[1,2]</answer>"]) == [1.0, 0.0]

    def test_iou_with_rescale(self):
        # model space 28x28 (grid 1,2,2 * patch 14), image 280x280 => 10x scale
        content = "<think>x</think><answer>{[0, 0, 14, 14]}</answer>"
        sol = "<answer>[0, 0, 140, 140]</answer>"
        r = rec_iou_reward(
            [content], [sol],
            image_grid_thw=[(1, 2, 2)], image_sizes=[(280, 280)],
        )
        assert r[0] > 0.9

    def test_iou_garbage_zero(self):
        r = rec_iou_reward(["no box"], ["<answer>[0,0,10,10]</answer>"],
                           image_grid_thw=[(1, 2, 2)], image_sizes=[(28, 28)])
        assert r == [0.0]

    def test_resize_bbox(self):
        assert resize_bbox([14, 14, 28, 28], 28, 28, 280, 280) == [140, 140, 280, 280]

    def test_prompt_template(self):
        assert "First output the thinking process" in rec_prompt("where is the car?")


class TestYamlCLIConfig:
    def _parser(self):
        p = argparse.ArgumentParser()
        p.add_argument("--model_name", required=True)
        p.add_argument("--lr", type=float, default=1e-4)
        return p

    def test_yaml_provides_required(self, tmp_path):
        cfg = tmp_path / "c.yaml"
        cfg.write_text("model_name: /m\nlr: 0.01\n")
        args = parse_with_yaml(self._parser(), ["--config", str(cfg)])
        assert args.model_name == "/m" and args.lr == 0.01

    def test_cli_overrides_yaml(self, tmp_path):
        cfg = tmp_path / "c.yaml"
        cfg.write_text("model_name: /m\nlr: 0.01\n")
        args = parse_with_yaml(self._parser(), ["--config", str(cfg), "--lr", "0.5"])
        assert args.lr == 0.5

    def test_unknown_key_rejected(self, tmp_path):
        cfg = tmp_path / "c.yaml"
        cfg.write_text("model_name: /m\nbogus: 1\n")
        with pytest.raises(SystemExit):
            parse_with_yaml(self._parser(), ["--config", str(cfg)])
