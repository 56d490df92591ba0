"""GRPO trainer tests: advantage math, stop masking, loss, and a full tiny-model step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from zoomearth_tpu.agent import prompts as PT
from zoomearth_tpu.agent.processor import Processor
from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.tokenizer import FakeTokenizer
from zoomearth_tpu.train.data import LRSGROSample
from zoomearth_tpu.train.grpo import (
    GRPOConfig,
    GRPOTrainer,
    _first_stop_mask,
    grpo_loss,
    per_token_logps,
)

CFG = VLMConfig.tiny()


class TestStopMask:
    def test_basic(self):
        ids = np.array([[5, 6, 7, 99, 8, 9]])
        m = _first_stop_mask(ids, np.array([1]), stops=(99,))
        assert m.tolist() == [[0, 1, 1, 1, 0, 0]]  # stop token included

    def test_no_stop_runs_to_end(self):
        ids = np.array([[5, 6, 7, 8]])
        m = _first_stop_mask(ids, np.array([2]), stops=(99,))
        assert m.tolist() == [[0, 0, 1, 1]]


class TestAdvantages:
    def test_mean_centered_grouped(self):
        # grouped advantage = reward - group mean, no std division (grpo_trainer.py:733)
        rewards = np.array([1.0, 3.0, 0.0, 4.0])  # two groups of G=2
        G = 2
        adv = rewards - np.repeat(rewards.reshape(-1, G).mean(1), G)
        np.testing.assert_allclose(adv, [-1.0, 1.0, -2.0, 2.0])


class TestLossMath:
    def _mini_batch(self, params):
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 400, size=(2, 16)).astype(np.int32)
        pos = np.broadcast_to(np.arange(16)[None, None], (3, 2, 16)).copy()
        mask = np.zeros((2, 16), np.int32)
        mask[:, 8:] = 1
        return dict(
            input_ids=jnp.asarray(ids),
            position_ids=jnp.asarray(pos),
            pixel_values=None,
            vision_meta=None,
            completion_mask=jnp.asarray(mask),
            advantages=jnp.asarray(np.array([1.0, -1.0], np.float32)),
            old_logps=None,
            ref_logps=None,
        )

    def test_loss_zero_at_old_equals_new_zero_beta(self):
        """With old == new (ratio 1) loss = -mean(adv) over masked tokens = 0 when
        advantages sum to zero (mean-centered groups)."""
        params = init_vlm_params(jax.random.key(1), CFG)
        batch = self._mini_batch(params)
        loss, aux = grpo_loss(params, CFG, batch, beta=0.0, epsilon_low=0.2, epsilon_high=0.2)
        assert float(loss) == pytest.approx(0.0, abs=1e-5)
        assert float(aux["completion_length"]) == 8.0

    def test_kl_zero_against_self(self):
        params = init_vlm_params(jax.random.key(1), CFG)
        batch = self._mini_batch(params)
        ref = per_token_logps(
            params, CFG, batch["input_ids"], batch["position_ids"], None, None
        )
        batch["ref_logps"] = ref
        loss, aux = grpo_loss(params, CFG, batch, beta=0.04, epsilon_low=0.2, epsilon_high=0.2)
        assert float(aux["kl"]) == pytest.approx(0.0, abs=1e-5)

    def test_per_token_logps_chunking_invariance(self):
        params = init_vlm_params(jax.random.key(1), CFG)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1, 400, size=(2, 20)).astype(np.int32))
        pos = jnp.asarray(np.broadcast_to(np.arange(20)[None, None], (3, 2, 20)).copy())
        a = per_token_logps(params, CFG, ids, pos, None, None, chunk=4)
        b = per_token_logps(params, CFG, ids, pos, None, None, chunk=16)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        # first position has no prediction
        assert np.asarray(a)[:, 0].tolist() == [0.0, 0.0]


@pytest.fixture
def tiny_trainer(monkeypatch):
    monkeypatch.setattr(PT, "rl_prompt", lambda q: PT.PREFIX + q + "<|im_end|>\n<|im_start|>assistant\n")
    monkeypatch.setattr(PT, "text_rl_prompt",
                        lambda q: "<|im_start|>system\nsolve<|im_end|>\n<|im_start|>user\n" + q
                        + "<|im_end|>\n<|im_start|>assistant\n")
    params = init_vlm_params(jax.random.key(0), CFG)
    proc = Processor(FakeTokenizer(CFG.tokens), CFG, max_pixels=4 * 28 * 28)
    rng = np.random.default_rng(3)
    imgs = {}

    def loader(s):
        if s.image_name not in imgs:
            imgs[s.image_name] = Image.fromarray(
                rng.integers(0, 255, (600, 600, 3), dtype=np.uint8)
            )
        return imgs[s.image_name]

    def length_reward(c1, c2, **kw):
        return [float(len(a) % 7) / 7.0 for a in c1]

    grpo_cfg = GRPOConfig(
        num_generations=2, max_completion_length=6, stage2_max_completion_length=4,
        rollout_temperature=1.0, learning_rate=1e-3, beta=0.04, num_iterations=1,
    )
    trainer = GRPOTrainer(
        params, CFG, grpo_cfg, proc, [length_reward], reward_names=["length"],
        max_cache_len=512, image_loader=loader,
        length_buckets=(256, 384), patch_buckets=(64, 128),
        cache_dtype="float32",
    )
    return trainer


def _samples():
    return [
        LRSGROSample(question_id="1", image_name="a.png", category="c", question="what?",
                     higher_level="p", ground_truth="car", bbox=[10, 10, 40, 40], type="object"),
        LRSGROSample(question_id="2", image_name="b.png", category="c", question="count?",
                     higher_level="p", ground_truth="3", bbox=[], type="global"),
    ]


def test_full_grpo_step(tiny_trainer):
    t = tiny_trainer
    before = jax.tree.leaves(t.params)[0].copy()
    metrics = t.step(_samples(), seed=0)
    assert np.isfinite(metrics["loss"])
    assert "rewards/length" in metrics and metrics["reward"] >= 0
    assert "kl" in metrics and np.isfinite(metrics["kl"])
    after = jax.tree.leaves(t.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))  # params updated


def test_rollout_structure(tiny_trainer):
    t = tiny_trainer
    rb = t.rollout(_samples(), seed=1)
    G = t.grpo.num_generations
    assert rb.input_ids.shape[0] == 2 * G
    # sample 0 has a dataset bbox -> stage 2 ran (completion2 non-empty);
    # sample 1 is global (bbox []) -> stage 2 skipped
    assert all(c != "" for c in rb.completions2[:G])
    assert all(c == "" for c in rb.completions2[G:])
    # grouped advantages mean-center within each group
    adv = rb.advantages.reshape(-1, G)
    np.testing.assert_allclose(adv.mean(1), 0.0, atol=1e-6)
    # completion mask nonzero and starts after the prompt
    assert rb.completion_mask.sum() > 0
    first_sup = rb.completion_mask.argmax(1)
    assert (first_sup > 0).all()
    # ref logps present (beta > 0)
    assert rb.ref_logps is not None


def test_num_iterations_buffering(tiny_trainer):
    t = tiny_trainer
    t.grpo = GRPOConfig(**{**t.grpo.__dict__, "num_iterations": 2})
    m1 = t.step(_samples(), seed=0)
    buffered = t._buffered
    m2 = t.step(_samples(), seed=99)  # must reuse the buffer, not re-roll
    assert t._buffered is buffered
    m3 = t.step(_samples(), seed=100)  # new rollout
    assert t._buffered is not buffered
    assert np.isfinite(m2["loss"]) and np.isfinite(m3["loss"])


def test_rollout_reuse_cache_path(tiny_trainer):
    """reuse_cache rollouts: stage-2 continues from the stage-1 cache and training
    sequences stitch GENERATED tokens (prompt + kept + chunk + completion2)."""
    import dataclasses as dc

    t = tiny_trainer
    t.grpo = dc.replace(t.grpo, reuse_cache=True)
    rb = t.rollout(_samples(), seed=5)
    G = t.grpo.num_generations
    assert all(c != "" for c in rb.completions2[:G])  # bbox sample took stage 2
    assert all(c == "" for c in rb.completions2[G:])
    assert rb.completion_mask.sum() > 0
    m = t.step(_samples(), seed=5)
    assert np.isfinite(m["loss"])


def test_rollout_reference_path_still_works(tiny_trainer):
    import dataclasses as dc

    t = tiny_trainer
    t.grpo = dc.replace(t.grpo, reuse_cache=False)
    rb = t.rollout(_samples(), seed=6)
    assert all(c != "" for c in rb.completions2[: t.grpo.num_generations])


def test_scale_rewards_std_normalization(tiny_trainer):
    import dataclasses as dc

    t = tiny_trainer
    t.grpo = dc.replace(t.grpo, scale_rewards=True)
    rb = t.rollout(_samples(), seed=7)
    G = t.grpo.num_generations
    adv = rb.advantages.reshape(-1, G)
    np.testing.assert_allclose(adv.mean(1), 0.0, atol=1e-5)
    # vllm_grpo_trainer variant: (r - mean) / (std + 1e-4)
    rewards = rb.rewards_per_func.sum(1).reshape(-1, G)
    want = (rewards - rewards.mean(1, keepdims=True)) / (rewards.std(1, keepdims=True) + 1e-4)
    np.testing.assert_allclose(adv, want, atol=1e-5)


def test_freeze_vision_modules(tiny_trainer):
    import dataclasses as dc

    t = tiny_trainer
    t.grpo = dc.replace(t.grpo, freeze_vision_modules=True)
    vis_before = jax.tree.map(lambda x: np.asarray(x).copy(), t.params["vision"])
    txt_before = np.asarray(jax.tree.leaves(t.params["text"])[0]).copy()
    t.step(_samples(), seed=8)
    for a, b in zip(jax.tree.leaves(vis_before), jax.tree.leaves(t.params["vision"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(txt_before, np.asarray(jax.tree.leaves(t.params["text"])[0]))


def test_tr_dpo_ref_sync(tiny_trainer):
    import dataclasses as dc

    t = tiny_trainer
    t.grpo = dc.replace(t.grpo, sync_ref_model=True, ref_model_sync_steps=1,
                        ref_model_mixup_alpha=0.5)
    ref_before = np.asarray(jax.tree.leaves(t.ref_params)[0]).copy()
    t.step(_samples(), seed=9)
    ref_after = np.asarray(jax.tree.leaves(t.ref_params)[0])
    pol_after = np.asarray(jax.tree.leaves(t.params)[0])
    assert not np.allclose(ref_before, ref_after)  # ref moved
    np.testing.assert_allclose(ref_after, 0.5 * pol_after + 0.5 * ref_before, atol=2e-2)


def test_text_only_rollout(tiny_trainer):
    """Imageless samples (legacy grpo.py text path): no vision anywhere in the batch."""
    t = tiny_trainer
    texty = [
        LRSGROSample(question_id="1", image_name="", category="m", question="1+1?",
                     higher_level="r", ground_truth="2", bbox=[], type="global",
                     image_path=None),
        LRSGROSample(question_id="2", image_name="", category="m", question="2*3?",
                     higher_level="r", ground_truth="6", bbox=[], type="global",
                     image_path=None),
    ]
    rb = t.rollout(texty, seed=10)
    assert rb.pixel_values is None and rb.vision_meta is None
    assert all(c == "" for c in rb.completions2)
    assert rb.completion_mask.sum() > 0
    m = t.step(texty, seed=10)
    assert np.isfinite(m["loss"])


def test_mixed_image_and_text_rollout(tiny_trainer):
    """One vision sample + one imageless sample in the same GRPO batch."""
    t = tiny_trainer
    mixed = [
        _samples()[0],
        LRSGROSample(question_id="3", image_name="", category="m", question="1+2?",
                     higher_level="r", ground_truth="3", bbox=[], type="global",
                     image_path=None),
    ]
    rb = t.rollout(mixed, seed=11)
    G = t.grpo.num_generations
    assert rb.pixel_values is not None  # the vision sample's images are packed
    assert all(c != "" for c in rb.completions2[:G])
    assert all(c == "" for c in rb.completions2[G:])
    m = t.step(mixed, seed=11)
    assert np.isfinite(m["loss"])


def test_lora_grpo_step(tiny_trainer):
    """LoRA path: base weights frozen, adapters train, KL reference is the
    adapter-disabled policy (zero-copy view; KL == 0 at step 1 since b=0)."""
    import dataclasses as dc

    from zoomearth_tpu.agent.processor import Processor
    from zoomearth_tpu.models.params import init_vlm_params
    from zoomearth_tpu.tokenizer import FakeTokenizer
    from zoomearth_tpu.train.grpo import GRPOTrainer
    from zoomearth_tpu.train.lora import is_lora, merge_lora, strip_lora

    t0 = tiny_trainer
    grpo_cfg = dc.replace(t0.grpo, use_lora=True, lora_r=4, lora_alpha=8.0)
    base = init_vlm_params(jax.random.key(2), CFG)
    trainer = GRPOTrainer(
        base, CFG, grpo_cfg, t0.processor, t0.reward_funcs, reward_names=t0.reward_names,
        max_cache_len=512, image_loader=t0.image_loader,
        length_buckets=(256, 384), patch_buckets=(64, 128), cache_dtype="float32",
    )
    w0 = trainer.params["text"]["layers"][0]["attn"]["wq"]
    assert is_lora(w0)
    base_before = np.asarray(w0["w"]).copy()
    b_before = np.asarray(w0["b"]).copy()
    assert np.all(b_before == 0)  # adapters start as identity
    m = trainer.step(_samples(), seed=3)
    assert np.isfinite(m["loss"])
    # KL at the first step: policy == adapter-disabled ref (b was 0 during rollout)
    assert abs(m["kl"]) < 1e-4
    w1 = trainer.params["text"]["layers"][0]["attn"]["wq"]
    np.testing.assert_array_equal(base_before, np.asarray(w1["w"]))  # base frozen
    assert not np.allclose(b_before, np.asarray(w1["b"]))  # adapter moved
    # second step exercises the refreshed ref view after donation
    m2 = trainer.step(_samples(), seed=4)
    assert np.isfinite(m2["loss"]) and np.isfinite(m2["kl"])
    # merged export equals base + a@b*s (w1 handles were donated by step 2 — re-fetch)
    w2 = trainer.params["text"]["layers"][0]["attn"]["wq"]
    merged = merge_lora(trainer.params)
    want = np.asarray(w2["w"]) + np.asarray(w2["a"]) @ np.asarray(w2["b"]) * float(w2["s"])
    np.testing.assert_allclose(np.asarray(merged["text"]["layers"][0]["attn"]["wq"]), want, atol=1e-5)
    # stripped view has plain weights
    assert not is_lora(strip_lora(trainer.params)["text"]["layers"][0]["attn"]["wq"])


def test_engine_backed_rollouts(tiny_trainer):
    """GRPOTrainer with rollout_engine=ServingEngine (the reference's decoupled
    vLLM-rollout trainer architecture, vllm_grpo_trainer.py:409-420): stage 1 runs as
    a hold_slot request, stage 2 as a Continuation on the held KV, weights hand off by
    pointer. max_slots < N exercises queueing + slot backfill mid-rollout."""
    from zoomearth_tpu.serve.engine import ServingEngine

    t = tiny_trainer
    engine = ServingEngine(
        t.params, CFG, max_slots=2, max_seq_len=512, decode_chunk=2,
        cache_dtype="float32", length_buckets=(256, 384), patch_buckets=(0, 64, 128),
    )
    engine.admission_debounce_s = 0.0
    t.rollout_engine = engine
    G = t.grpo.num_generations
    rb = t.rollout(_samples(), seed=1)
    assert rb.input_ids.shape[0] == 2 * G
    # sample 0 has a dataset bbox -> stage 2 ran through Continuations
    assert all(c != "" for c in rb.completions2[:G])
    # sample 1 is global (bbox []) -> its held slots were released, no stage 2
    assert all(c == "" for c in rb.completions2[G:])
    before = jax.tree.leaves(t.params)[0].copy()
    metrics = t.step(_samples(), seed=2)
    assert np.isfinite(metrics["loss"])
    after = jax.tree.leaves(t.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_log_completions(tiny_trainer, tmp_path):
    """log_completions appends jsonl rollout records (reference grpo_config.py
    log_completions wandb table, offline-first)."""
    import json

    t = tiny_trainer
    t.grpo = dataclasses.replace(t.grpo, log_completions=True,
                                 completions_path=str(tmp_path / "c.jsonl"))
    t.step(_samples(), seed=0)
    lines = [json.loads(l) for l in (tmp_path / "c.jsonl").read_text().splitlines()]
    assert len(lines) == 2 * t.grpo.num_generations
    assert all("completion1" in l and "reward" in l for l in lines)
