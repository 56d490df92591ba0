"""Parameter initialization and HF checkpoint conversion.

Param trees are plain nested dicts of jnp arrays (functional style — trivially
shardable with NamedSharding and checkpointable with orbax). Conversion accepts either
a live torch state_dict (tests) or a directory of HF safetensors (production weight
port of Qwen2.5-VL-3B; reference loads the same weights at grpo_trainer.py:263-266).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TextConfig, VisionConfig, VLMConfig


def _dense_init(key, in_dim, out_dim, dtype):
    scale = (2.0 / (in_dim + out_dim)) ** 0.5
    return jax.random.normal(key, (in_dim, out_dim), dtype=jnp.float32).astype(dtype) * scale


def init_vision_params(key, cfg: VisionConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, cfg.depth + 4)
    E, I = cfg.hidden_size, cfg.intermediate_size
    blocks = []
    for i in range(cfg.depth):
        bk = jax.random.split(keys[i], 6)
        blocks.append(
            {
                "norm1": {"scale": jnp.ones((E,), dtype)},
                "norm2": {"scale": jnp.ones((E,), dtype)},
                "attn": {
                    "wqkv": _dense_init(bk[0], E, 3 * E, dtype),
                    "bqkv": jnp.zeros((3 * E,), dtype),
                    "wo": _dense_init(bk[1], E, E, dtype),
                    "bo": jnp.zeros((E,), dtype),
                },
                "mlp": {
                    "wg": _dense_init(bk[2], E, I, dtype),
                    "bg": jnp.zeros((I,), dtype),
                    "wu": _dense_init(bk[3], E, I, dtype),
                    "bu": jnp.zeros((I,), dtype),
                    "wd": _dense_init(bk[4], I, E, dtype),
                    "bd": jnp.zeros((E,), dtype),
                },
            }
        )
    m = cfg.merge_unit * E
    return {
        "patch_embed": {"kernel": _dense_init(keys[-4], cfg.patch_dim, E, dtype)},
        "blocks": blocks,
        "merger": {
            "ln_q": {"scale": jnp.ones((E,), dtype)},
            "w0": _dense_init(keys[-3], m, m, dtype),
            "b0": jnp.zeros((m,), dtype),
            "w1": _dense_init(keys[-2], m, cfg.out_hidden_size, dtype),
            "b1": jnp.zeros((cfg.out_hidden_size,), dtype),
        },
    }


def init_text_params(key, cfg: TextConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    E, I = cfg.hidden_size, cfg.intermediate_size
    H, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    layers = []
    for i in range(cfg.num_hidden_layers):
        lk = jax.random.split(keys[i], 7)
        layers.append(
            {
                "input_ln": {"scale": jnp.ones((E,), dtype)},
                "post_ln": {"scale": jnp.ones((E,), dtype)},
                "attn": {
                    "wq": _dense_init(lk[0], E, H * D, dtype),
                    "bq": jnp.zeros((H * D,), dtype),
                    "wk": _dense_init(lk[1], E, Hkv * D, dtype),
                    "bk": jnp.zeros((Hkv * D,), dtype),
                    "wv": _dense_init(lk[2], E, Hkv * D, dtype),
                    "bv": jnp.zeros((Hkv * D,), dtype),
                    "wo": _dense_init(lk[3], H * D, E, dtype),
                },
                "mlp": {
                    "wg": _dense_init(lk[4], E, I, dtype),
                    "wu": _dense_init(lk[5], E, I, dtype),
                    "wd": _dense_init(lk[6], I, E, dtype),
                },
            }
        )
    params = {
        "embed": {"weight": jax.random.normal(keys[-2], (cfg.vocab_size, E), jnp.float32).astype(dtype) * 0.02},
        "layers": layers,
        "final_ln": {"scale": jnp.ones((E,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": _dense_init(keys[-1], E, cfg.vocab_size, dtype)}
    return params


def init_vlm_params(key, cfg: VLMConfig, dtype=None) -> Dict:
    if dtype is None:
        dtype = jnp.dtype(cfg.dtype)
    kv, kt = jax.random.split(key)
    return {
        "vision": init_vision_params(kv, cfg.vision, dtype),
        "text": init_text_params(kt, cfg.text, dtype),
    }


# ---------------------------------------------------------------------------
# HF -> zoomearth_tpu conversion
# ---------------------------------------------------------------------------

def _np(t):
    """torch tensor / numpy array -> numpy (no torch import at module level)."""
    if hasattr(t, "detach"):
        return t.detach().to("cpu").float().numpy()
    return np.asarray(t)


def _strip_prefix(key: str) -> str:
    for p in ("model.", "language_model.model.", ""):
        if key.startswith(p):
            key = key[len(p):]
            break
    return key


def convert_hf_state_dict(state: Dict, cfg: VLMConfig, dtype=None) -> Dict:
    """HF Qwen2.5-VL (or Qwen2-VL) state_dict -> our param tree.

    Accepts transformers>=4.52 key layout (model.visual.*, model.language_model.*,
    lm_head.*) as well as older (visual.*, model.layers.*).
    """
    if dtype is None:
        dtype = jnp.dtype(cfg.dtype)
    flat = {}
    for k, v in state.items():
        k = _strip_prefix(k)
        flat[k] = v

    def get(name):
        arr = _np(flat[name])
        return jnp.asarray(arr, dtype)

    def lin(name):  # torch Linear weight (out, in) -> (in, out)
        return jnp.asarray(_np(flat[name]).T, dtype)

    vcfg, tcfg = cfg.vision, cfg.text
    vis_prefix = "visual." if "visual.patch_embed.proj.weight" in flat else "vision_tower."
    pe = _np(flat[vis_prefix + "patch_embed.proj.weight"])  # (E, C, T, P, P)
    vision = {
        "patch_embed": {"kernel": jnp.asarray(pe.reshape(vcfg.hidden_size, -1).T, dtype)},
        "blocks": [],
        "merger": {
            "ln_q": {"scale": get(vis_prefix + "merger.ln_q.weight")},
            "w0": lin(vis_prefix + "merger.mlp.0.weight"),
            "b0": get(vis_prefix + "merger.mlp.0.bias"),
            "w1": lin(vis_prefix + "merger.mlp.2.weight"),
            "b1": get(vis_prefix + "merger.mlp.2.bias"),
        },
    }
    for i in range(vcfg.depth):
        b = f"{vis_prefix}blocks.{i}."
        vision["blocks"].append(
            {
                "norm1": {"scale": get(b + "norm1.weight")},
                "norm2": {"scale": get(b + "norm2.weight")},
                "attn": {
                    "wqkv": lin(b + "attn.qkv.weight"),
                    "bqkv": get(b + "attn.qkv.bias"),
                    "wo": lin(b + "attn.proj.weight"),
                    "bo": get(b + "attn.proj.bias"),
                },
                "mlp": {
                    "wg": lin(b + "mlp.gate_proj.weight"),
                    "bg": get(b + "mlp.gate_proj.bias"),
                    "wu": lin(b + "mlp.up_proj.weight"),
                    "bu": get(b + "mlp.up_proj.bias"),
                    "wd": lin(b + "mlp.down_proj.weight"),
                    "bd": get(b + "mlp.down_proj.bias"),
                },
            }
        )

    lm_prefix = "language_model." if "language_model.embed_tokens.weight" in flat else ""
    text = {
        "embed": {"weight": get(lm_prefix + "embed_tokens.weight")},
        "layers": [],
        "final_ln": {"scale": get(lm_prefix + "norm.weight")},
    }
    for i in range(tcfg.num_hidden_layers):
        l = f"{lm_prefix}layers.{i}."
        text["layers"].append(
            {
                "input_ln": {"scale": get(l + "input_layernorm.weight")},
                "post_ln": {"scale": get(l + "post_attention_layernorm.weight")},
                "attn": {
                    "wq": lin(l + "self_attn.q_proj.weight"),
                    "bq": get(l + "self_attn.q_proj.bias"),
                    "wk": lin(l + "self_attn.k_proj.weight"),
                    "bk": get(l + "self_attn.k_proj.bias"),
                    "wv": lin(l + "self_attn.v_proj.weight"),
                    "bv": get(l + "self_attn.v_proj.bias"),
                    "wo": lin(l + "self_attn.o_proj.weight"),
                },
                "mlp": {
                    "wg": lin(l + "mlp.gate_proj.weight"),
                    "wu": lin(l + "mlp.up_proj.weight"),
                    "wd": lin(l + "mlp.down_proj.weight"),
                },
            }
        )
    if not tcfg.tie_word_embeddings and "lm_head.weight" in flat:
        text["lm_head"] = {"weight": lin("lm_head.weight")}
    return {"vision": vision, "text": text}


def load_hf_checkpoint(path: str, cfg: VLMConfig = None, dtype=None) -> Dict:
    """Load an HF safetensors checkpoint directory into our param tree."""
    from safetensors import safe_open

    if cfg is None:
        cfg = VLMConfig.from_hf_dir(path)
    state = {}
    index_file = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index_file):
        with open(index_file) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
    else:
        shards = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    return convert_hf_state_dict(state, cfg, dtype)


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
