"""SFT training loop tests: collate semantics, loss decreases, checkpoint/resume."""

import json

import jax
import numpy as np
import pytest
from PIL import Image

from zoomearth_tpu.agent.processor import Processor
from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.tokenizer import FakeTokenizer
from zoomearth_tpu.train.data import SFTSample
from zoomearth_tpu.train.sft import SFTConfig
from zoomearth_tpu.train.sft_loop import SFTLoopConfig, collate_sft, sft_label, sft_prompt, train_sft

CFG = VLMConfig.tiny()


def _sample(i, cut=False):
    return SFTSample(
        question=f"what is at site {i}?",
        cut=cut,
        global_desc="An aerial scene.",
        stage_1_reasoning="I should look closer." if cut else "The whole image suffices.",
        area="top-left",
        bbox=[50, 60, 200, 220] if cut else [],
        stage_2_reasoning="It is a car.",
        ground_truth="car",
        image_name=f"img{i}.png",
    )


@pytest.fixture
def processor():
    return Processor(FakeTokenizer(CFG.tokens), CFG, max_pixels=4 * 28 * 28)


def _loader(seed=0):
    rng = np.random.default_rng(seed)

    def load(s):
        return Image.fromarray(rng.integers(0, 255, (700, 650, 3), dtype=np.uint8))

    return load


class TestCollate:
    def test_uncut_single_image(self, processor):
        batch = collate_sft([_sample(0)], processor, image_loader=_loader(),
                            length_buckets=(1536,), patch_buckets=(64,))
        assert batch["input_ids"].shape == (1, 1536)
        n_img_tokens = int((batch["input_ids"] == CFG.tokens.image_pad).sum())
        # expected token count from the actual smart-resized grid
        from zoomearth_tpu.image.preprocess import num_vision_tokens
        img = _loader()(None)
        (_, grid), = processor.preprocess_images([img])
        assert n_img_tokens == num_vision_tokens(grid)
        # label supervised region exists and excludes image tokens
        sup = batch["labels"] != -100
        assert sup.sum() > 0
        assert not np.any((batch["input_ids"] == CFG.tokens.image_pad) & sup)

    def test_cut_two_images_label_embeds_second(self, processor):
        batch = collate_sft([_sample(0, cut=True)], processor, image_loader=_loader(),
                            length_buckets=(1536,), patch_buckets=(64,))
        n_img_tokens = int((batch["input_ids"] == CFG.tokens.image_pad).sum())
        assert n_img_tokens > 2  # two images worth of tokens
        # stage-2 image sits INSIDE the supervised region boundaries but is masked
        sup_idx = np.nonzero(batch["labels"][0] != -100)[0]
        img_idx = np.nonzero(batch["input_ids"][0] == CFG.tokens.image_pad)[0]
        assert img_idx.max() > sup_idx.min()  # second image after supervision starts

    def test_label_text_matches_reference_format(self):
        lab = sft_label(_sample(1, cut=True))
        assert "<location>top-left</location>" in lab
        assert "<bbox>[50, 60, 200, 220]</bbox>" in lab
        assert lab.endswith("<answer>car</answer> <|endoftext|>")
        assert "<|image_pad|>" in lab
        lab2 = sft_label(_sample(1, cut=False))
        assert "<|image_pad|>" not in lab2 and "<location>" not in lab2

    def test_prompt_has_image_and_question(self):
        p = sft_prompt("what?")
        assert p.startswith("<|image_pad|> \n") and "what?" in p and "<location>" in p


def test_lr_schedule_matches_reference_formula():
    """Warmup-then-linear-decay-to-zero, the reference's
    get_linear_schedule_with_warmup (src/train/SFT.py:16,201-206):
    lr(s) = peak*s/warmup for s<warmup; peak*(total-s)/(total-warmup) after."""
    from zoomearth_tpu.train.sft import make_schedule

    peak, warmup, total = 3e-5, 100, 1000
    sched = make_schedule(SFTConfig(learning_rate=peak, warmup_steps=warmup, total_steps=total))

    def ref(s):
        if s < warmup:
            return peak * s / warmup
        return peak * max(0.0, (total - s) / (total - warmup))

    for s in [0, 1, 50, 99, 100, 101, 500, 999, 1000]:
        np.testing.assert_allclose(float(sched(s)), ref(s), rtol=1e-6, atol=1e-12)
    # past the horizon the lr stays pinned at zero (optax linear_schedule clamps)
    assert float(sched(1500)) == 0.0


def test_total_steps_derived_from_dataset(tmp_path, processor):
    """total_steps=None -> epochs * steps_per_epoch (reference num_training_steps)."""
    from zoomearth_tpu.train.sft import make_schedule

    cfg = SFTConfig(learning_rate=1e-3, warmup_steps=2, total_steps=None)
    assert cfg.total_steps is None
    # standalone make_schedule falls back to a 10k horizon rather than crashing
    assert float(make_schedule(cfg)(0)) == 0.0


def test_train_loss_decreases_and_resume(tmp_path, processor):
    data = [_sample(i, cut=(i % 2 == 0)) for i in range(4)]
    params = init_vlm_params(jax.random.key(0), CFG)
    sft_cfg = SFTConfig(learning_rate=1e-3, warmup_steps=1, max_grad_norm=1.0)
    loop_cfg = SFTLoopConfig(
        output_dir=str(tmp_path / "out"), num_train_epochs=50, batch_size=2,
        save_steps=4, log_steps=1,
    )
    new_params, hist = train_sft(
        params, CFG, sft_cfg, loop_cfg, data, processor,
        image_loader=_loader(), max_steps=8,
    )
    assert len(hist) == 8
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert np.isfinite(hist[-1]["grad_norm"])

    # metrics file written
    lines = [json.loads(l) for l in open(tmp_path / "out" / "metrics.jsonl")]
    assert len(lines) == 8

    # checkpoint exists at step 4 and 8; resume fast-forwards past them
    info = json.load(open(tmp_path / "out" / "training_info.json"))
    assert info["step"] == 8
    params2 = init_vlm_params(jax.random.key(0), CFG)
    loop_cfg2 = SFTLoopConfig(
        output_dir=str(tmp_path / "out"), num_train_epochs=50, batch_size=2,
        save_steps=100, log_steps=1, resume_from_checkpoint=True,
    )
    resumed_params, hist2 = train_sft(
        params2, CFG, sft_cfg, loop_cfg2, data, processor,
        image_loader=_loader(), max_steps=2,
    )
    assert hist2[0]["step"] == 9  # continued after the restored step
    assert hist2[-1]["loss"] < hist[0]["loss"]


def test_save_callbacks(tmp_path):
    """ExportHFCallback + BenchmarkCallback fire on save (reference
    PushToHubRevisionCallback: hub revision push + benchmark job submission)."""
    import json

    import jax

    from zoomearth_tpu.config import VLMConfig
    from zoomearth_tpu.models.params import init_vlm_params
    from zoomearth_tpu.train.callbacks import BenchmarkCallback, ExportHFCallback, run_callbacks

    cfg = VLMConfig.tiny()
    params = init_vlm_params(jax.random.key(0), cfg)
    exp = ExportHFCallback(export_dir=str(tmp_path / "hub"), cfg=cfg, revision="r1")
    bench = BenchmarkCallback(output_dir=str(tmp_path / "jobs"), data_file="d.jsonl",
                              image_folder="imgs")
    run_callbacks([exp, bench], 50, str(tmp_path / "checkpoint-50"), params)
    out = tmp_path / "hub" / "r1-step000050"
    assert out.is_dir() and any(f.suffix == ".safetensors" for f in out.iterdir())
    jobs = [json.loads(l) for l in (tmp_path / "jobs" / "benchmark_jobs.jsonl").read_text().splitlines()]
    assert jobs[0]["step"] == 50 and "cli.infer" in " ".join(jobs[0]["cmd"])


def test_load_sft_hf_dataset_roundtrip(tmp_path):
    """The reference stores SFT data as an HF dataset (load_from_disk, SFT.py:181);
    load_sft_dataset must ingest that directory format identically to jsonl."""
    import json

    from datasets import Dataset

    from zoomearth_tpu.train.data import load_sft_dataset, load_sft_jsonl

    rows = [
        {"question": "what is here?", "cut": True, "global": "a port scene",
         "stage_1_reasoning": "think1", "area": "top left", "bbox": [1.0, 2.0, 30.0, 40.0],
         "stage_2_reasoning": "think2", "ground_truth": "ship", "image_name": "a.png"},
        {"question": "how many?", "cut": False, "global": "farmland",
         "stage_1_reasoning": "t", "area": "", "bbox": [],
         "stage_2_reasoning": "", "ground_truth": "3", "image_name": "b.png"},
    ]
    hf_dir = tmp_path / "hf_ds"
    Dataset.from_list(rows).save_to_disk(str(hf_dir))
    jsonl = tmp_path / "same.jsonl"
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    from_hf = load_sft_dataset(str(hf_dir), "imgs")
    from_jsonl = load_sft_dataset(str(jsonl), "imgs")
    assert from_hf == from_jsonl
    assert from_hf[0].cut is True and from_hf[0].global_desc == "a port scene"
    assert from_hf[0].image_path == "imgs/a.png"
