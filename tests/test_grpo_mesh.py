"""GRPO on an 8-device mesh: rollout + optimizer step with dp/fsdp/tp-sharded params.

The trainer's jitted programs carry no explicit shardings — placement follows the
input params' NamedShardings (XLA propagates and inserts collectives), exactly how the
driver's dryrun shards SFT. This is the RL analogue of the reference's 8-way torchrun
GRPO (run_scripts/train_grpo.sh:33-38)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from zoomearth_tpu.agent import prompts as PT
from zoomearth_tpu.agent.processor import Processor
from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.parallel.mesh import make_mesh, param_shardings
from zoomearth_tpu.tokenizer import FakeTokenizer
from zoomearth_tpu.train.data import LRSGROSample
from zoomearth_tpu.train.grpo import GRPOConfig, GRPOTrainer

CFG = VLMConfig.tiny()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_grpo_step_on_8dev_mesh(monkeypatch):
    monkeypatch.setattr(PT, "rl_prompt", lambda q: PT.PREFIX + q + "<|im_end|>\n<|im_start|>assistant\n")
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    params = init_vlm_params(jax.random.key(0), CFG)
    shardings = param_shardings(params, mesh)
    params = jax.tree.map(jax.device_put, params, shardings)

    proc = Processor(FakeTokenizer(CFG.tokens), CFG, max_pixels=4 * 28 * 28)
    rng = np.random.default_rng(5)
    img = Image.fromarray(rng.integers(0, 255, (600, 600, 3), dtype=np.uint8))

    grpo_cfg = GRPOConfig(
        num_generations=2, max_completion_length=5, stage2_max_completion_length=4,
        rollout_temperature=1.0, learning_rate=1e-3, beta=0.04,
    )
    trainer = GRPOTrainer(
        params, CFG, grpo_cfg, proc, [lambda c1, c2, **kw: [float(len(a) % 5) for a in c1]],
        reward_names=["len"], max_cache_len=512, image_loader=lambda s: img,
        length_buckets=(256, 384), patch_buckets=(64, 128), cache_dtype="float32",
    )
    samples = [
        LRSGROSample(question_id="1", image_name="a", category="c", question="what?",
                     higher_level="p", ground_truth="car", bbox=[10, 10, 40, 40], type="object"),
        LRSGROSample(question_id="2", image_name="b", category="c", question="count?",
                     higher_level="p", ground_truth="3", bbox=[], type="global"),
    ]
    m = trainer.step(samples, seed=0)
    assert np.isfinite(m["loss"]) and np.isfinite(m["kl"])
    # params stayed sharded across the mesh after the update
    leaf = jax.tree.leaves(trainer.params)[0]
    assert len(leaf.sharding.device_set) == 8
