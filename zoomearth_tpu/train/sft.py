"""SFT: masked-label supervised fine-tuning, sharded over the (data, fsdp, tensor) mesh.

Replaces the reference's custom accelerate loop (src/train/SFT.py:259-390): same
training semantics — AdamW + linear warmup, grad accumulation, bf16 params, grad
clipping, label masking via the text_pair convention — but as one jitted SPMD train
step over the mesh (gradients reduce over 'data' implicitly; optimizer states shard
with their params, giving ZeRO-like memory scaling on the 'fsdp' axis for free).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import VLMConfig
from ..models.vlm import masked_ce_loss, vlm_forward
from ..parallel.mesh import param_shardings


@dataclasses.dataclass(frozen=True)
class SFTConfig:
    """Knob names follow the reference's TrainingConfig (SFT.py:21-74)."""

    learning_rate: float = 3e-5
    warmup_steps: int = 100
    # schedule horizon (reference num_training_steps = epochs * len(dataloader),
    # SFT.py:201-206); None -> derived from the dataset by train_sft, or 10k standalone
    total_steps: Optional[int] = None
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    max_grad_norm: float = 1.0
    gradient_accumulation_steps: int = 1


def make_schedule(cfg: SFTConfig) -> optax.Schedule:
    """Warmup then LINEAR DECAY TO ZERO at total_steps — the reference's
    get_linear_schedule_with_warmup (src/train/SFT.py:16,201-206): lr ramps 0 ->
    learning_rate over warmup_steps, then decays linearly to 0 at total_steps."""
    warmup = max(cfg.warmup_steps, 1)
    total = max(cfg.total_steps or 10_000, warmup + 1)
    return optax.schedules.join_schedules(
        [
            optax.schedules.linear_schedule(0.0, cfg.learning_rate, warmup),
            optax.schedules.linear_schedule(cfg.learning_rate, 0.0, total - warmup),
        ],
        boundaries=[warmup],
    )


def make_optimizer(cfg: SFTConfig) -> optax.GradientTransformation:
    schedule = make_schedule(cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, weight_decay=cfg.weight_decay
        ),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def sft_loss(params, cfg: VLMConfig, batch):
    """batch: dict with input_ids (B,S), labels (B,S), position_ids (3,B,S), and
    optionally pixel_values (P,D) + vision_meta arrays."""
    logits, _ = vlm_forward(
        params,
        cfg,
        batch["input_ids"],
        batch["position_ids"],
        pixel_values=batch.get("pixel_values"),
        vision_meta=batch.get("vision_meta"),
        attn_valid=batch.get("attn_valid"),
    )
    loss, n = masked_ce_loss(logits, batch["labels"])
    return loss, n


def train_step(params, opt_state, batch, *, cfg: VLMConfig, tx: optax.GradientTransformation):
    """One SPMD train step -> (params, opt_state, metrics)."""
    (loss, n_tok), grads = jax.value_and_grad(sft_loss, has_aux=True)(params, cfg, batch)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    gnorm = optax.global_norm(grads)
    return params, opt_state, {"loss": loss, "grad_norm": gnorm, "tokens": n_tok}


def batch_shardings(mesh: Mesh, has_vision: bool, patch_shardable: bool = True):
    """Sharding specs for one training batch: batch dim on 'data'; packed patches on
    'data' too when divisible (pure layout choice — XLA keeps semantics)."""
    s = {
        "input_ids": NamedSharding(mesh, P("data", None)),
        "labels": NamedSharding(mesh, P("data", None)),
        "position_ids": NamedSharding(mesh, P(None, "data", None)),
    }
    if has_vision:
        s["pixel_values"] = NamedSharding(mesh, P("data" if patch_shardable else None, None))
        s["vision_meta"] = {
            k: NamedSharding(mesh, P())
            for k in ("perm", "inv_perm_merged", "seg_window", "seg_full", "pos_ids")
        }
    return s


def make_sharded_train_step(
    mesh: Mesh, cfg: VLMConfig, sft_cfg: SFTConfig, params_tree, has_vision: bool = True
):
    """Build (jitted_step, tx, param_sharding, init_opt_state_fn) for the mesh.

    Optimizer state inherits each param's sharding (ZeRO semantics fall out of pjit).
    """
    tx = make_optimizer(sft_cfg)
    p_shard = param_shardings(params_tree, mesh)

    def init_opt(params):
        return tx.init(params)

    step = jax.jit(
        partial(train_step, cfg=cfg, tx=tx),
        donate_argnums=(0, 1),
    )
    return step, tx, p_shard, init_opt
