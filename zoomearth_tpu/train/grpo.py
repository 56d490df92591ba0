"""GRPO: two-stage rollout RL with Region-Guided rewards, grouped advantages, clip+KL.

TPU-native rebuild of the reference VLMGRPOTrainer (trainer/grpo_trainer.py:126-919)
with the same training semantics but restructured for SPMD:

- Stage-2 rollouts are BATCHED into one generate call (the reference loops one
  generate per sample, grpo_trainer.py:595-643 — its worst serialization).
- G rollouts of each prompt stay contiguous in the batch (RepeatRandomSampler
  semantics, grpo_trainer.py:76-123), so grouped advantages are a reshape —
  no cross-host gather needed (SURVEY.md §5.8).
- The training sequence per sample matches the reference stitching: for samples with a
  dataset bbox, ids = prompt1 + completion1[:answer] + image2 tokens + completion2;
  otherwise prompt1 + completion1. The optimized region starts at the stage-1 prompt
  length and runs to the first EOS (grpo_trainer.py:578,645-649) — image tokens inside
  it INCLUDED, as in the reference (set mask_image_tokens=True to exclude them).
- Advantages are mean-centered only (no std division; grpo_trainer.py:733-734).
- Loss: PPO clip with epsilon_low/high + beta * KL(exp(r)-r-1) vs a frozen reference
  policy, per-sequence mean over completion tokens (grpo_trainer.py:804-826).
- Rollout weight "sync" is free: the generator consumes the live param tree (the
  vLLM-trainer's weight push, vllm_grpo_trainer.py:531-546, has no analogue).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..agent import prompts as PT
from ..agent.processor import Processor
from ..config import VLMConfig
from ..image.geometry import cut_image, resize_image
from ..models.rope import mrope_position_ids_batch
from ..models.vit import vision_metadata
from ..models.vlm import vlm_forward
from ..rewards.zoomearth import extract_bboxes_float
from ..runtime.generate import (
    DEFAULT_LENGTH_BUCKETS,
    DEFAULT_PATCH_BUCKETS,
    GenerationConfig,
    Generator,
    bucket,
    prepare_batch,
)
from ..train.data import LRSGROSample


@dataclasses.dataclass(frozen=True)
class GRPOConfig:
    """Knobs follow the reference GRPOConfig (trainer/grpo_config.py:22-350) and the
    shipped run config (run_scripts/train_grpo.sh:33-60)."""

    num_generations: int = 4  # G (train_grpo.sh: 4)
    max_completion_length: int = 256  # stage-1 rollout budget
    stage2_max_completion_length: int = 256  # customized_funcs chat: 800
    rollout_temperature: float = 0.7  # customized_funcs.py:12
    learning_rate: float = 1e-7
    beta: float = 0.04  # KL coefficient
    epsilon_low: float = 0.2
    epsilon_high: float = 0.2
    num_iterations: int = 1  # mu: reuse rollouts for this many optimizer steps
    max_grad_norm: float = 1.0
    stage1_image_size: int = 512  # customized resize (infer/RL variant)
    mask_image_tokens: bool = False  # True diverges from reference (see module doc)
    reward_weights: Optional[Sequence[float]] = None
    # Advantage normalization: the default VLMGRPOTrainer mean-centers only
    # (grpo_trainer.py:733-734); the vLLM trainer also divides by the group std
    # (vllm_grpo_trainer.py:~705-712). True selects the vLLM variant.
    scale_rewards: bool = False
    # Freeze the vision tower: its updates (gradient AND weight-decay) are zeroed
    # (reference grpo_trainer.py:277 freeze_vision_modules).
    freeze_vision_modules: bool = False
    # TR-DPO reference sync (reference trainer/grpo_config.py sync_ref_model /
    # ref_model_mixup_alpha / ref_model_sync_steps): every sync steps,
    # ref <- alpha * policy + (1 - alpha) * ref.
    sync_ref_model: bool = False
    ref_model_mixup_alpha: float = 0.6
    ref_model_sync_steps: int = 512
    # LoRA (the reference PEFT path, grpo_trainer.py:293-305): adapters on the decoder
    # matmuls train, base weights freeze, and the KL reference is the adapter-DISABLED
    # policy (a view of the same base arrays — no second copy in HBM).
    use_lora: bool = False
    lora_r: int = 8
    lora_alpha: float = 16.0
    # Log rollout samples (reference grpo_config.py log_completions: a wandb table of
    # prompt/completion/reward rows): appends jsonl records to completions_path (or
    # "grpo_completions.jsonl") each step — the offline-first equivalent.
    log_completions: bool = False
    completions_path: Optional[str] = None
    # Stage-2 rollouts continue from the stage-1 KV cache (prefilling only the crop's
    # vision tokens) AND the training sequence keeps the GENERATED stage-1 tokens
    # verbatim. The reference instead re-tokenizes the stitched text (decode->strip->
    # re-encode, grpo_trainer.py:607-611), which can shift token boundaries so the
    # optimized logps don't exactly match what the policy produced. False = reference
    # behavior (re-tokenized, full re-prefill).
    reuse_cache: bool = True


@dataclasses.dataclass
class RolloutBatch:
    """Device-ready arrays + host metadata for one GRPO optimizer step."""

    input_ids: np.ndarray  # (N, S) stitched training sequences, right-padded
    completion_mask: np.ndarray  # (N, S) 1 where the loss applies
    position_ids: np.ndarray  # (3, N, S)
    pixel_values: Optional[np.ndarray]
    vision_meta: Optional[dict]
    advantages: np.ndarray  # (N,)
    old_logps: Optional[np.ndarray]  # (N, S) — None when num_iterations == 1
    ref_logps: Optional[np.ndarray]  # (N, S) — None when beta == 0
    completions1: List[str]
    completions2: List[str]
    rewards_per_func: np.ndarray  # (N, F) for metrics


def _first_stop_mask(ids: np.ndarray, start: np.ndarray, stops: Sequence[int]) -> np.ndarray:
    """mask[i, t] = 1 for start[i] <= t <= first stop token at/after start (incl.).

    Vectorized: an O(N*S) pure-Python double loop here ran every rollout under the
    training loop (~4M iterations at N=batch*G, S=2048 — real seconds on a 1-core
    host)."""
    N, S = ids.shape
    t = np.arange(S)[None, :]
    after_start = t >= start[:, None].astype(np.int64)
    is_stop = np.isin(ids, np.asarray(list(stops))) & after_start
    # index of the first stop at/after start (S when none)
    first_stop = np.where(is_stop.any(1), is_stop.argmax(1), S)
    return (after_start & (t <= first_stop[:, None])).astype(np.int32)


def per_token_logps(
    params, cfg: VLMConfig, input_ids, position_ids, pixel_values, vision_meta, *, chunk: int = 256
):
    """log p(token_t | tokens_<t) for every position (first position gets 0).

    Hidden states are computed once; the (B, S, V) logits are never materialized —
    log-softmax + gather runs over sequence chunks (the reference iterates rows for the
    same reason, grpo_trainer.py:494-504)."""
    from ..models.decoder import logits_from_hidden
    from ..models.vlm import embed_tokens, merge_vision_embeddings
    from ..models.decoder import decoder_forward

    x = embed_tokens(params, input_ids)
    if pixel_values is not None:
        from ..models.vit import vit_forward

        vis = vit_forward(
            params["vision"], cfg.vision, pixel_values,
            vision_meta["perm"], vision_meta["inv_perm_merged"],
            vision_meta["seg_window"], vision_meta["seg_full"], vision_meta["pos_ids"],
        )
        x = merge_vision_embeddings(x, vis, input_ids == cfg.tokens.image_pad)
    hidden, _ = decoder_forward(params["text"], cfg.text, x, position_ids)
    B, S, E = hidden.shape
    # pad S to a chunk multiple for the scan
    pad = (-S) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
    n_chunks = hidden.shape[1] // chunk
    hidden_chunks = hidden.reshape(B, n_chunks, chunk, E).transpose(1, 0, 2, 3)
    # targets: token at t+1 predicts from hidden at t
    targets = jnp.pad(input_ids[:, 1:], ((0, 0), (0, 1 + pad)))
    target_chunks = targets.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    def one_chunk(args):
        h, tgt = args
        logits = logits_from_hidden(params["text"], cfg.text, h)  # (B, chunk, V) fp32
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]

    lp = jax.lax.map(one_chunk, (hidden_chunks, target_chunks))  # (n_chunks, B, chunk)
    lp = lp.transpose(1, 0, 2).reshape(B, -1)[:, :S]
    # shift: logps[t] = log p(ids[t] | ids[<t]); position 0 has no prediction
    return jnp.concatenate([jnp.zeros((B, 1), lp.dtype), lp[:, :-1]], axis=1)


def grpo_loss(
    params,
    cfg: VLMConfig,
    batch: Dict,
    *,
    beta: float,
    epsilon_low: float,
    epsilon_high: float,
    chunk: int = 256,
):
    """Clipped-ratio GRPO loss (grpo_trainer.py:770-828). batch arrays are jnp."""
    logps = per_token_logps(
        params, cfg, batch["input_ids"], batch["position_ids"],
        batch.get("pixel_values"), batch.get("vision_meta"), chunk=chunk,
    )
    mask = batch["completion_mask"].astype(jnp.float32)
    adv = batch["advantages"][:, None]
    old = batch["old_logps"] if batch.get("old_logps") is not None else jax.lax.stop_gradient(logps)
    coef1 = jnp.exp(logps - old)
    coef2 = jnp.clip(coef1, 1 - epsilon_low, 1 + epsilon_high)
    loss1 = coef1 * adv
    loss2 = coef2 * adv
    per_token = -jnp.minimum(loss1, loss2)
    metrics = {}
    if beta > 0 and batch.get("ref_logps") is not None:
        ref = batch["ref_logps"]
        kl = jnp.exp(ref - logps) - (ref - logps) - 1
        per_token = per_token + beta * kl
        metrics["kl"] = (kl * mask).sum(1) / jnp.maximum(mask.sum(1), 1)
    denom = jnp.maximum(mask.sum(1), 1)
    loss = ((per_token * mask).sum(1) / denom).mean()
    clipped = (loss1 < loss2).astype(jnp.float32)
    metrics["clip_ratio"] = (clipped * mask).sum() / jnp.maximum(mask.sum(), 1)
    metrics["completion_length"] = mask.sum(1).mean()
    if "kl" in metrics:
        metrics["kl"] = metrics["kl"].mean()
    return loss, metrics


class GRPOTrainer:
    """Single-process SPMD GRPO engine (DP/FSDP/TP via the generator's & step's mesh)."""

    def __init__(
        self,
        params,
        cfg: VLMConfig,
        grpo_cfg: GRPOConfig,
        processor: Processor,
        reward_funcs: Sequence[Callable],
        *,
        reward_names: Optional[Sequence[str]] = None,
        max_cache_len: int = 2048,
        image_loader=None,
        length_buckets=DEFAULT_LENGTH_BUCKETS,
        patch_buckets=DEFAULT_PATCH_BUCKETS,
        cache_dtype=None,
        rollout_engine=None,
        prompt_fn: Optional[Callable[[str], str]] = None,
    ):
        """rollout_engine: optional serve.engine.ServingEngine used as the rollout
        actor instead of the in-process Generator — the reference's decoupled-engine
        trainer (vllm_grpo_trainer.py:409-420: colocated vLLM engine + weight push
        :531-546). Stage 1 maps to a hold_slot request, stage 2 to a Continuation on
        the held KV; the weight push is a same-HBM pointer handoff (engine.params =
        self.params) instead of a state_dict copy. Episodes pipeline through the
        engine's continuous batching (host crops overlap other rows' decode)."""
        if grpo_cfg.use_lora:
            if grpo_cfg.sync_ref_model:
                # Under LoRA the KL reference IS the frozen base (strip_lora of the
                # live params, re-taken every step) — a TR-DPO mixup would blend the
                # base with itself, and the two trees don't even share leaf structure.
                raise ValueError(
                    "sync_ref_model (TR-DPO) is incompatible with use_lora: the LoRA "
                    "reference policy is the frozen base model by construction"
                )
            from .lora import apply_lora

            params = apply_lora(params, jax.random.key(0),
                                r=grpo_cfg.lora_r, alpha=grpo_cfg.lora_alpha)
        self.params = params
        self.cfg = cfg
        self.grpo = grpo_cfg
        self.processor = processor
        self.reward_funcs = list(reward_funcs)
        self.reward_names = list(reward_names or [f.__name__ for f in reward_funcs])
        self.generator = Generator(
            params, cfg, max_cache_len=max_cache_len,
            cache_dtype=cache_dtype or jnp.dtype(cfg.dtype),
        )
        self.rollout_engine = rollout_engine
        # stage-1 prompt builder for image samples (default: the LRS_GRO template,
        # agent/prompts.py rl_prompt == reference qwen_module.py:85-114). Injectable so
        # harnesses with tiny token budgets can swap a short template without
        # monkeypatching the prompts module.
        self.prompt_fn = prompt_fn or PT.rl_prompt
        self.image_loader = image_loader
        self.length_buckets = length_buckets
        self.patch_buckets = patch_buckets
        # Reference policy for KL. LoRA: the adapter-disabled policy — a VIEW of the
        # same base arrays, no copy (PEFT semantics, grpo_trainer.py:299-303). The base
        # arrays never change (updates masked), so the view stays valid... except the
        # optimizer update DONATES buffers; zero-update donation rewrites in place with
        # identical values, so sharing is safe. Full fine-tune: a real buffer copy
        # (create_reference_model semantics, grpo_trainer.py:305).
        if grpo_cfg.beta <= 0:
            self.ref_params = None
        elif grpo_cfg.use_lora:
            from .lora import strip_lora

            self.ref_params = strip_lora(params)
        else:
            self.ref_params = jax.tree.map(jnp.copy, params)
        tx = optax.chain(
            optax.clip_by_global_norm(grpo_cfg.max_grad_norm),
            optax.adamw(grpo_cfg.learning_rate),
        )
        self.tx = tx
        self.opt_state = jax.jit(tx.init)(params)
        self._loss_grad = jax.jit(
            jax.value_and_grad(
                partial(
                    grpo_loss,
                    beta=grpo_cfg.beta,
                    epsilon_low=grpo_cfg.epsilon_low,
                    epsilon_high=grpo_cfg.epsilon_high,
                ),
                has_aux=True,
            ),
            static_argnames=("cfg",),
        )
        self._logps_fn = jax.jit(per_token_logps, static_argnames=("cfg",))
        self._update = jax.jit(self._apply_updates, donate_argnums=(0, 1))
        self._sync_ref_fn = jax.jit(self._sync_ref, donate_argnums=(0,))
        self._buffered: Optional[RolloutBatch] = None
        self._step_count = 0
        self.metrics_history: List[Dict] = []

    def _apply_updates(self, params, opt_state, grads):
        updates, opt_state = self.tx.update(grads, opt_state, params)
        if self.grpo.freeze_vision_modules:
            # zero the UPDATES (not just grads): adamw's weight decay would otherwise
            # still move frozen params
            updates = dict(updates)
            updates["vision"] = jax.tree.map(jnp.zeros_like, updates["vision"])
        if self.grpo.use_lora:
            from .lora import mask_base_updates

            updates = mask_base_updates(updates, params)
        return optax.apply_updates(params, updates), opt_state

    def _sync_ref(self, ref_params, params):
        """TR-DPO mixup: ref <- alpha * policy + (1 - alpha) * ref."""
        a = self.grpo.ref_model_mixup_alpha
        return jax.tree.map(lambda r, p: (a * p.astype(jnp.float32) + (1 - a) * r.astype(jnp.float32)).astype(r.dtype), ref_params, params)

    # ------------------------------------------------------------------
    # Rollout
    # ------------------------------------------------------------------

    def rollout(self, samples: Sequence[LRSGROSample], seed: int = 0) -> RolloutBatch:
        """G-repeated two-stage rollouts + rewards + advantages for one step."""
        G = self.grpo.num_generations
        cfg = self.cfg
        tk = self.processor.tokenizer
        rep: List[LRSGROSample] = [s for s in samples for _ in range(G)]

        if self.image_loader is None:
            from PIL import Image

            def image_loader(s):
                return Image.open(s.image_path).convert("RGB")
        else:
            image_loader = self.image_loader

        # imageless samples (legacy text GRPO, reference grpo.py:118-142) take the
        # text-only prompt and skip every vision step
        full_images = [
            image_loader(s) if (s.image_path or s.image_name) else None for s in rep
        ]
        # stage-1 inputs: customized resize (max 512, min side 30) customized_funcs.py:76-85
        stage1_images = [
            resize_image(im, self.grpo.stage1_image_size, min_side=30) if im is not None else None
            for im in full_images
        ]
        prompts_text = [
            self.prompt_fn(s.question) if im is not None else PT.text_rl_prompt(s.question)
            for s, im in zip(rep, stage1_images)
        ]
        enc1 = [
            self.processor.encode(t, [im] if im is not None else [])
            for t, im in zip(prompts_text, stage1_images)
        ]
        prompt1_lens = [len(ids) for ids, _ in enc1]
        if self.rollout_engine is not None:
            # decoupled-actor path (the reference's vLLM-trainer architecture):
            # episodes pipeline through the serving engine's continuous batching
            (out1_tokens, completions1, completions2, scales, s2_idx,
             s2_prefix_tokens, s2_chunks, s2_chunk_imgs, out2_tokens_by_row) = (
                self._engine_rollout(rep, full_images, stage1_images, enc1, seed)
            )
            return self._stitch_rollout(
                rep, enc1, prompt1_lens, out1_tokens, completions1, completions2,
                scales, s2_idx, s2_prefix_tokens, s2_chunks, s2_chunk_imgs,
                [], [], out2_tokens_by_row, chunked=True,
            )
        batch1 = prepare_batch(
            cfg, [ids for ids, _ in enc1], [imgs for _, imgs in enc1],
            length_buckets=self.length_buckets, patch_buckets=self.patch_buckets,
        )
        gen1 = GenerationConfig(
            max_new_tokens=self.grpo.max_completion_length,
            temperature=self.grpo.rollout_temperature,
        )
        self.generator.params = self.params  # live weight handoff
        if self.grpo.reuse_cache:
            out1_tokens, stage1_cache = self.generator.generate(
                batch1, gen1, seed=seed, return_cache=True
            )
        else:
            out1_tokens = self.generator.generate(batch1, gen1, seed=seed)
            stage1_cache = None
        completions1 = [tk.decode(t).strip() for t in out1_tokens]

        # ---- stage 2 (batched) for samples whose DATASET bbox is non-empty ----
        completions2 = [""] * len(rep)
        scales = [1.0] * len(rep)
        s2_idx: List[int] = []
        s2_token_lists, s2_images = [], []  # re-tokenized path artifacts
        s2_prefix_tokens: List[List[int]] = []  # reuse_cache path: kept + chunk ids
        s2_chunks: List[List[int]] = []
        s2_chunk_imgs: List[List] = []
        for i, (s, c1) in enumerate(zip(rep, completions1)):
            if not s.bbox or full_images[i] is None:
                continue
            boxes = extract_bboxes_float(c1)
            w0, h0 = stage1_images[i].size
            box = boxes[0] if boxes else [0, 0, w0, h0]  # whole-image fallback :598-601
            full = full_images[i]
            scale = max(max(full.width, full.height) / self.grpo.stage1_image_size, 1)
            scales[i] = scale
            box = [p * scale for p in box]
            crop = resize_image(cut_image(full, box), self.grpo.stage1_image_size, min_side=30)
            s2_idx.append(i)
            if self.grpo.reuse_cache:
                kept, residual, chunk, crop_prepped = self._build_stage2_chunk(
                    out1_tokens[i], crop
                )
                s2_prefix_tokens.append(kept)
                s2_chunks.append(chunk)
                s2_chunk_imgs.append(crop_prepped)
            else:
                s2_text = prompts_text[i] + c1.split("<answer>")[0] + PT.VISION_TOKENS
                ids2, prepped2 = self.processor.encode(s2_text, [stage1_images[i], crop])
                s2_token_lists.append(ids2)
                s2_images.append(prepped2)
        gen2 = GenerationConfig(
            max_new_tokens=self.grpo.stage2_max_completion_length,
            temperature=self.grpo.rollout_temperature,
        )
        out2_tokens_by_row: Dict[int, List[int]] = {}
        if s2_idx and self.grpo.reuse_cache:
            from ..runtime.generate import prepare_continuation

            # inert rows keep their slot idle; outputs ignored
            full_chunks = [[cfg.tokens.pad] for _ in rep]
            full_imgs: List[List] = [[] for _ in rep]
            keep_len = [int(batch1.lengths[i]) for i in range(len(rep))]
            starts = [int(batch1.next_pos[i]) for i in range(len(rep))]
            for j, i in enumerate(s2_idx):
                full_chunks[i] = s2_chunks[j]
                full_imgs[i] = s2_chunk_imgs[j]
                keep_len[i] = int(batch1.lengths[i]) + len(s2_prefix_tokens[j])
                starts[i] = int(batch1.next_pos[i]) + len(s2_prefix_tokens[j])
            bc = prepare_continuation(
                cfg, full_chunks, full_imgs, starts,
                length_buckets=self.length_buckets, patch_buckets=self.patch_buckets,
            )
            inert = np.ones((len(rep),), bool)
            inert[s2_idx] = False  # rows without a crop decode NOTHING (start done)
            out2_all = self.generator.continue_generate(
                stage1_cache, bc, np.asarray(keep_len, np.int32), gen2, seed=seed + 1,
                inert_mask=inert,
            )
            for j, i in enumerate(s2_idx):
                out2_tokens_by_row[i] = out2_all[i]
                completions2[i] = tk.decode(out2_all[i]).strip()
        elif s2_idx:
            batch2 = prepare_batch(
                cfg, s2_token_lists, s2_images,
                length_buckets=self.length_buckets, patch_buckets=self.patch_buckets,
            )
            out2_tokens = self.generator.generate(batch2, gen2, seed=seed + 1)
            for j, i in enumerate(s2_idx):
                out2_tokens_by_row[i] = out2_tokens[j]
                completions2[i] = tk.decode(out2_tokens[j]).strip()

        return self._stitch_rollout(
            rep, enc1, prompt1_lens, out1_tokens, completions1, completions2,
            scales, s2_idx, s2_prefix_tokens, s2_chunks, s2_chunk_imgs,
            s2_token_lists, s2_images, out2_tokens_by_row,
            chunked=self.grpo.reuse_cache,
        )

    def _build_stage2_chunk(self, out1_tokens_i, crop):
        """Host-side stage-2 continuation pieces: (kept stage-1 tokens, residual text,
        chunk ids = residual + expanded crop vision tokens, preprocessed crop)."""
        from ..agent.episode import split_kept_tokens

        tk = self.processor.tokenizer
        raw = tk.decode(out1_tokens_i, skip_special_tokens=False)
        kept, residual = split_kept_tokens(tk, out1_tokens_i, raw.split("<answer>")[0])
        crop_prepped = self.processor.preprocess_images([crop])
        chunk = (tk.encode(residual) if residual else []) + self.processor.expand_image_pads(
            tk.encode(PT.VISION_TOKENS), [crop_prepped[0][1]]
        )
        return kept, residual, chunk, crop_prepped

    def _engine_rollout(self, rep, full_images, stage1_images, enc1, seed=0):
        """Rollouts through the decoupled ServingEngine actor (the reference's
        vllm_grpo_trainer architecture, vllm_grpo_trainer.py:409-420,531-575):
        stage 1 = hold_slot request, stage 2 = Continuation on the held KV. The weight
        push is `engine.params = self.params` — the engine's jitted programs take the
        param tree as an argument, so the handoff is a pointer swap in the same HBM
        (no state_dict copy, no broadcast: SPMD + single-controller).

        Completions are processed in submission order; each row's crop + chunk build
        happens while other rows keep decoding in the engine (continuous batching), and
        released slots backfill queued rows, so N may exceed engine.max_slots."""
        from ..serve.engine import Continuation, Request

        eng = self.rollout_engine
        tk = self.processor.tokenizer
        eng.params = self.params  # weight push == same-HBM pointer handoff
        # seed the engine's sampling key: engine rollouts are reproducible given the
        # same seed AND the same scheduling (admission batching perturbs the key-split
        # order — approximate determinism, unlike the bitwise-reproducible Generator)
        eng._key = jax.random.key(seed)
        was_running = eng._running
        if not was_running:
            eng.start()
        N = len(rep)
        temp = self.grpo.rollout_temperature
        # unique id prefix per rollout call: a crashed/retried step must never read a
        # previous call's stale completions under recycled request ids
        self._rollout_nonce = getattr(self, "_rollout_nonce", 0) + 1
        rid = lambda i, stage: f"grpo{self._rollout_nonce}-{i}-{stage}"
        try:
            for i in range(N):
                ids, prepped = enc1[i]
                eng.submit(Request(
                    request_id=rid(i, "s1"), token_ids=list(ids), images=list(prepped),
                    max_tokens=self.grpo.max_completion_length, temperature=temp,
                    hold_slot=True,
                ))
            out1_tokens: List[List[int]] = [[] for _ in range(N)]
            completions1 = [""] * N
            completions2 = [""] * N
            scales = [1.0] * N
            s2_idx: List[int] = []
            s2_prefix_tokens: List[List[int]] = []
            s2_chunks: List[List[int]] = []
            s2_chunk_imgs: List[List] = []
            for i in range(N):
                c1 = eng.get_completion(rid(i, "s1"), timeout=3600)
                out1_tokens[i] = list(c1.token_ids)
                completions1[i] = tk.decode(c1.token_ids).strip()
                s = rep[i]
                if not s.bbox or full_images[i] is None:
                    eng.release_slot(rid(i, "s1"))
                    continue
                boxes = extract_bboxes_float(completions1[i])
                w0, h0 = stage1_images[i].size
                box = boxes[0] if boxes else [0, 0, w0, h0]  # whole-image fallback
                full = full_images[i]
                scale = max(max(full.width, full.height) / self.grpo.stage1_image_size, 1)
                scales[i] = scale
                box = [p * scale for p in box]
                crop = resize_image(cut_image(full, box), self.grpo.stage1_image_size, min_side=30)
                kept, _, chunk, crop_prepped = self._build_stage2_chunk(out1_tokens[i], crop)
                s2_idx.append(i)
                s2_prefix_tokens.append(kept)
                s2_chunks.append(chunk)
                s2_chunk_imgs.append(crop_prepped)
                eng.submit_continuation(Continuation(
                    parent_request_id=rid(i, "s1"), request_id=rid(i, "s2"),
                    chunk_ids=chunk, images=crop_prepped, kept_tokens=len(kept),
                    max_tokens=self.grpo.stage2_max_completion_length, temperature=temp,
                ))
            out2_tokens_by_row: Dict[int, List[int]] = {}
            for i in s2_idx:
                c2 = eng.get_completion(rid(i, "s2"), timeout=3600)
                out2_tokens_by_row[i] = list(c2.token_ids)
                completions2[i] = tk.decode(c2.token_ids).strip()
        finally:
            # a mid-rollout exception must not poison a PERSISTENT engine: cancel
            # everything this call submitted. Requests still in flight at exception
            # time complete AFTER a naive held/results sweep — with hold_slot=True
            # they would re-insert into eng.held and leak pool slots forever, so
            # cancel_prefix waits for them to drain before sweeping.
            eng.cancel_prefix(f"grpo{self._rollout_nonce}-")
            if not was_running:
                eng.stop()
        return (out1_tokens, completions1, completions2, scales, s2_idx,
                s2_prefix_tokens, s2_chunks, s2_chunk_imgs, out2_tokens_by_row)

    def _stitch_rollout(
        self, rep, enc1, prompt1_lens, out1_tokens, completions1, completions2,
        scales, s2_idx, s2_prefix_tokens, s2_chunks, s2_chunk_imgs,
        s2_token_lists, s2_images, out2_tokens_by_row, *, chunked,
    ) -> RolloutBatch:
        """Stitch training sequences + rewards + grouped advantages + old/ref logps.

        chunked=True: stage-2 rows were generated as KV-reuse continuations (prompt +
        kept stage-1 prefix + crop chunk); False: full re-tokenized stage-2 prompts."""
        cfg = self.cfg
        G = self.grpo.num_generations
        train_ids_list: List[List[int]] = []
        train_imgs: List[List] = []
        for i in range(len(rep)):
            prompt_ids = [int(t) for t in enc1[i][0]]
            if completions2[i] != "":
                j = s2_idx.index(i)
                if chunked:
                    ids = prompt_ids + s2_prefix_tokens[j] + s2_chunks[j]
                    ids += out2_tokens_by_row[i] + [cfg.tokens.endoftext]
                    train_imgs.append(enc1[i][1] + s2_chunk_imgs[j])
                else:
                    ids = list(s2_token_lists[j]) + out2_tokens_by_row[i] + [cfg.tokens.endoftext]
                    train_imgs.append(s2_images[j])
            else:
                ids = prompt_ids + out1_tokens[i] + [cfg.tokens.endoftext]
                train_imgs.append(enc1[i][1])
            train_ids_list.append(ids)

        S = bucket(max(len(x) for x in train_ids_list), self.length_buckets)
        N = len(rep)
        input_ids = np.full((N, S), cfg.tokens.pad, np.int32)
        for i, ids in enumerate(train_ids_list):
            input_ids[i, : len(ids)] = ids
        start = np.asarray(prompt1_lens, np.int32)
        stops = (cfg.tokens.eos, cfg.tokens.endoftext)
        completion_mask = _first_stop_mask(input_ids, start, stops)
        # beyond the real sequence nothing applies
        for i, ids in enumerate(train_ids_list):
            completion_mask[i, len(ids):] = 0
        if self.grpo.mask_image_tokens:
            completion_mask[input_ids == cfg.tokens.image_pad] = 0

        grids_per_seq = [[g for _, g in imgs] for imgs in train_imgs]
        pos, _ = mrope_position_ids_batch(
            input_ids, grids_per_seq, image_pad_id=cfg.tokens.image_pad,
            merge_size=cfg.vision.spatial_merge_size,
            attention_mask=(input_ids != cfg.tokens.pad).astype(np.int32),
        )
        all_pv = [pv for imgs in train_imgs for pv, _ in imgs]
        all_grids = [g for gs in grids_per_seq for g in gs]
        if all_pv:
            pv = np.concatenate(all_pv, axis=0)
            P = bucket(pv.shape[0], self.patch_buckets)
            meta = vision_metadata(all_grids, cfg.vision, pad_to=P)
            if P > pv.shape[0]:
                pv = np.concatenate([pv, np.zeros((P - pv.shape[0], pv.shape[1]), pv.dtype)])
            vision_meta = {
                "perm": meta.perm, "inv_perm_merged": meta.inv_perm_merged,
                "seg_window": meta.seg_window, "seg_full": meta.seg_full,
                "pos_ids": meta.pos_ids,
            }
        else:  # all-text batch
            pv = None
            vision_meta = None

        # ---- rewards + grouped advantages ----
        reward_kwargs: Dict[str, list] = {
            "question": [s.question for s in rep],
            "ground_truth": [s.ground_truth for s in rep],
            "bbox": [s.bbox for s in rep],
            "scale": scales,
            "image_path": [s.image_path for s in rep],
            "category": [s.category for s in rep],
            "type": [s.type for s in rep],
        }
        F = len(self.reward_funcs)
        rewards_per_func = np.zeros((N, F), np.float32)
        for fi, fn in enumerate(self.reward_funcs):
            rewards_per_func[:, fi] = np.asarray(
                fn(completions1, completions2, **reward_kwargs), np.float32
            )
        weights = np.asarray(self.grpo.reward_weights or [1.0] * F, np.float32)
        rewards = rewards_per_func @ weights
        grouped = rewards.reshape(-1, G)
        advantages = (rewards - np.repeat(grouped.mean(1), G)).astype(np.float32)
        if self.grpo.scale_rewards:
            # vLLM-trainer variant: divide by group std (vllm_grpo_trainer.py:~705-712)
            advantages = advantages / (np.repeat(grouped.std(1), G) + 1e-4)

        # ---- old / ref logps ----
        jbatch = dict(
            input_ids=jnp.asarray(input_ids),
            position_ids=jnp.asarray(pos),
            pixel_values=jnp.asarray(pv) if pv is not None else None,
            vision_meta={k: jnp.asarray(v) for k, v in vision_meta.items()} if vision_meta else None,
        )
        old_logps = None
        if self.grpo.num_iterations > 1:
            old_logps = np.asarray(
                self._logps_fn(self.params, cfg, jbatch["input_ids"], jbatch["position_ids"],
                               jbatch["pixel_values"], jbatch["vision_meta"])
            )
        ref_logps = None
        if self.grpo.beta > 0:
            ref_logps = np.asarray(
                self._logps_fn(self.ref_params, cfg, jbatch["input_ids"], jbatch["position_ids"],
                               jbatch["pixel_values"], jbatch["vision_meta"])
            )
        return RolloutBatch(
            input_ids=input_ids, completion_mask=completion_mask, position_ids=pos,
            pixel_values=pv, vision_meta=vision_meta, advantages=advantages,
            old_logps=old_logps, ref_logps=ref_logps,
            completions1=completions1, completions2=completions2,
            rewards_per_func=rewards_per_func,
        )

    # ------------------------------------------------------------------
    # Optimizer step
    # ------------------------------------------------------------------

    def step(self, samples: Sequence[LRSGROSample], seed: int = 0) -> Dict:
        """One GRPO optimizer step (rollouts regenerated every num_iterations steps)."""
        if self._step_count % self.grpo.num_iterations == 0:
            self._buffered = self.rollout(samples, seed=seed)
        rb = self._buffered
        self._step_count += 1

        batch = dict(
            input_ids=jnp.asarray(rb.input_ids),
            completion_mask=jnp.asarray(rb.completion_mask),
            position_ids=jnp.asarray(rb.position_ids),
            pixel_values=jnp.asarray(rb.pixel_values) if rb.pixel_values is not None else None,
            vision_meta={k: jnp.asarray(v) for k, v in rb.vision_meta.items()} if rb.vision_meta else None,
            advantages=jnp.asarray(rb.advantages),
            old_logps=jnp.asarray(rb.old_logps) if rb.old_logps is not None else None,
            ref_logps=jnp.asarray(rb.ref_logps) if rb.ref_logps is not None else None,
        )
        (loss, aux), grads = self._loss_grad(self.params, self.cfg, batch)
        self.params, self.opt_state = self._update(self.params, self.opt_state, grads)
        if self.grpo.use_lora and self.ref_params is not None:
            # the update donated the old buffers; re-take the adapter-disabled view of
            # the (value-identical) new base arrays
            from .lora import strip_lora

            self.ref_params = strip_lora(self.params)
        if (
            self.grpo.sync_ref_model
            and self.ref_params is not None
            and (self._step_count + 1) % self.grpo.ref_model_sync_steps == 0
        ):
            self.ref_params = self._sync_ref_fn(self.ref_params, self.params)
        rewards = self._weighted_rewards(rb.rewards_per_func)
        metrics = {
            "loss": float(loss),
            "reward": float(rewards.mean()),
            "reward_std": float(rewards.reshape(-1, self.grpo.num_generations).std(1).mean()),
            "completion_length": float(aux["completion_length"]),
            "clip_ratio": float(aux["clip_ratio"]),
        }
        if "kl" in aux:
            metrics["kl"] = float(aux["kl"])
        for fi, name in enumerate(self.reward_names):
            metrics[f"rewards/{name}"] = float(rb.rewards_per_func[:, fi].mean())
        self.metrics_history.append(metrics)
        if self.grpo.log_completions:
            self._log_completions(rb)
        return metrics

    def _weighted_rewards(self, rewards_per_func: np.ndarray) -> np.ndarray:
        """(N, F) per-function rewards -> (N,) TRAINING rewards (same weights the
        advantage computation applies — logged rewards must match the advantages
        logged alongside them when grpo.reward_weights is set)."""
        F = rewards_per_func.shape[1]
        weights = np.asarray(self.grpo.reward_weights or [1.0] * F, np.float32)
        return rewards_per_func @ weights

    def _log_completions(self, rb: RolloutBatch):
        """Append this step's rollout samples as jsonl (reference log_completions,
        grpo_config.py:22-350: a wandb completion table; offline-first here)."""
        import json

        path = self.grpo.completions_path or "grpo_completions.jsonl"
        rewards = self._weighted_rewards(rb.rewards_per_func)
        with open(path, "a") as f:
            for i in range(len(rb.completions1)):
                f.write(json.dumps({
                    "step": self._step_count,
                    "completion1": rb.completions1[i],
                    "completion2": rb.completions2[i],
                    "reward": float(rewards[i]),
                    "advantage": float(rb.advantages[i]),
                }) + "\n")
