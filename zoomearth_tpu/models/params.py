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
    def norm_p():
        p = {"scale": jnp.ones((E,), dtype)}
        if cfg.norm_type == "layer":
            p["bias"] = jnp.zeros((E,), dtype)
        return p

    blocks = []
    for i in range(cfg.depth):
        bk = jax.random.split(keys[i], 6)
        if cfg.mlp_type == "gelu_fc":
            mlp = {
                "w1": _dense_init(bk[2], E, I, dtype),
                "b1": jnp.zeros((I,), dtype),
                "w2": _dense_init(bk[3], I, E, dtype),
                "b2": jnp.zeros((E,), dtype),
            }
        else:
            mlp = {
                "wg": _dense_init(bk[2], E, I, dtype),
                "bg": jnp.zeros((I,), dtype),
                "wu": _dense_init(bk[3], E, I, dtype),
                "bu": jnp.zeros((I,), dtype),
                "wd": _dense_init(bk[4], I, E, dtype),
                "bd": jnp.zeros((E,), dtype),
            }
        blocks.append(
            {
                "norm1": norm_p(),
                "norm2": norm_p(),
                "attn": {
                    "wqkv": _dense_init(bk[0], E, 3 * E, dtype),
                    "bqkv": jnp.zeros((3 * E,), dtype),
                    "wo": _dense_init(bk[1], E, E, dtype),
                    "bo": jnp.zeros((E,), dtype),
                },
                "mlp": mlp,
            }
        )
    m = cfg.merge_unit * E
    return {
        "patch_embed": {"kernel": _dense_init(keys[-4], cfg.patch_dim, E, dtype)},
        "blocks": blocks,
        "merger": {
            "ln_q": norm_p(),
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

    def norm_p(name):
        p = {"scale": get(name + ".weight")}
        if vcfg.norm_type == "layer":
            p["bias"] = get(name + ".bias")
        return p

    vision = {
        "patch_embed": {"kernel": jnp.asarray(pe.reshape(vcfg.hidden_size, -1).T, dtype)},
        "blocks": [],
        "merger": {
            "ln_q": norm_p(vis_prefix + "merger.ln_q"),
            "w0": lin(vis_prefix + "merger.mlp.0.weight"),
            "b0": get(vis_prefix + "merger.mlp.0.bias"),
            "w1": lin(vis_prefix + "merger.mlp.2.weight"),
            "b1": get(vis_prefix + "merger.mlp.2.bias"),
        },
    }
    for i in range(vcfg.depth):
        b = f"{vis_prefix}blocks.{i}."
        if vcfg.mlp_type == "gelu_fc":
            mlp = {
                "w1": lin(b + "mlp.fc1.weight"),
                "b1": get(b + "mlp.fc1.bias"),
                "w2": lin(b + "mlp.fc2.weight"),
                "b2": get(b + "mlp.fc2.bias"),
            }
        else:
            mlp = {
                "wg": lin(b + "mlp.gate_proj.weight"),
                "bg": get(b + "mlp.gate_proj.bias"),
                "wu": lin(b + "mlp.up_proj.weight"),
                "bu": get(b + "mlp.up_proj.bias"),
                "wd": lin(b + "mlp.down_proj.weight"),
                "bd": get(b + "mlp.down_proj.bias"),
            }
        vision["blocks"].append(
            {
                "norm1": norm_p(b + "norm1"),
                "norm2": norm_p(b + "norm2"),
                "attn": {
                    "wqkv": lin(b + "attn.qkv.weight"),
                    "bqkv": get(b + "attn.qkv.bias"),
                    "wo": lin(b + "attn.proj.weight"),
                    "bo": get(b + "attn.proj.bias"),
                },
                "mlp": mlp,
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


# ---------------------------------------------------------------------------
# zoomearth_tpu -> HF export (checkpoint interchange; analog of the reference's hub
# push, utils/callbacks.py:43-77, but local)
# ---------------------------------------------------------------------------

def export_hf_state_dict(params, cfg: VLMConfig) -> Dict[str, np.ndarray]:
    """Our param tree -> HF Qwen2.5-VL state_dict (numpy, transformers>=4.52 keys)."""
    out: Dict[str, np.ndarray] = {}

    def put(name, arr, transpose=False):
        a = np.asarray(arr, dtype=np.float32)
        out[name] = a.T.copy() if transpose else a

    v, t = params["vision"], params["text"]
    vcfg = cfg.vision
    pe = np.asarray(v["patch_embed"]["kernel"], np.float32).T  # (E, patch_dim)
    out["model.visual.patch_embed.proj.weight"] = pe.reshape(
        vcfg.hidden_size, vcfg.in_channels, vcfg.temporal_patch_size, vcfg.patch_size, vcfg.patch_size
    ).copy()
    for i, b in enumerate(v["blocks"]):
        p = f"model.visual.blocks.{i}."
        put(p + "norm1.weight", b["norm1"]["scale"])
        put(p + "norm2.weight", b["norm2"]["scale"])
        put(p + "attn.qkv.weight", b["attn"]["wqkv"], transpose=True)
        put(p + "attn.qkv.bias", b["attn"]["bqkv"])
        put(p + "attn.proj.weight", b["attn"]["wo"], transpose=True)
        put(p + "attn.proj.bias", b["attn"]["bo"])
        put(p + "mlp.gate_proj.weight", b["mlp"]["wg"], transpose=True)
        put(p + "mlp.gate_proj.bias", b["mlp"]["bg"])
        put(p + "mlp.up_proj.weight", b["mlp"]["wu"], transpose=True)
        put(p + "mlp.up_proj.bias", b["mlp"]["bu"])
        put(p + "mlp.down_proj.weight", b["mlp"]["wd"], transpose=True)
        put(p + "mlp.down_proj.bias", b["mlp"]["bd"])
    put("model.visual.merger.ln_q.weight", v["merger"]["ln_q"]["scale"])
    put("model.visual.merger.mlp.0.weight", v["merger"]["w0"], transpose=True)
    put("model.visual.merger.mlp.0.bias", v["merger"]["b0"])
    put("model.visual.merger.mlp.2.weight", v["merger"]["w1"], transpose=True)
    put("model.visual.merger.mlp.2.bias", v["merger"]["b1"])

    put("model.language_model.embed_tokens.weight", t["embed"]["weight"])
    for i, l in enumerate(t["layers"]):
        p = f"model.language_model.layers.{i}."
        put(p + "input_layernorm.weight", l["input_ln"]["scale"])
        put(p + "post_attention_layernorm.weight", l["post_ln"]["scale"])
        put(p + "self_attn.q_proj.weight", l["attn"]["wq"], transpose=True)
        put(p + "self_attn.q_proj.bias", l["attn"]["bq"])
        put(p + "self_attn.k_proj.weight", l["attn"]["wk"], transpose=True)
        put(p + "self_attn.k_proj.bias", l["attn"]["bk"])
        put(p + "self_attn.v_proj.weight", l["attn"]["wv"], transpose=True)
        put(p + "self_attn.v_proj.bias", l["attn"]["bv"])
        put(p + "self_attn.o_proj.weight", l["attn"]["wo"], transpose=True)
        put(p + "mlp.gate_proj.weight", l["mlp"]["wg"], transpose=True)
        put(p + "mlp.up_proj.weight", l["mlp"]["wu"], transpose=True)
        put(p + "mlp.down_proj.weight", l["mlp"]["wd"], transpose=True)
    put("model.language_model.norm.weight", t["final_ln"]["scale"])
    if not cfg.text.tie_word_embeddings and "lm_head" in t:
        put("lm_head.weight", t["lm_head"]["weight"], transpose=True)
    return out


def save_hf_checkpoint(params, cfg: VLMConfig, path: str):
    """Write an HF-format checkpoint dir (model.safetensors; config.json if absent)."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    state = export_hf_state_dict(params, cfg)
    save_file(state, os.path.join(path, "model.safetensors"))
    cfg_path = os.path.join(path, "config.json")
    if not os.path.exists(cfg_path):
        v, t, tok = cfg.vision, cfg.text, cfg.tokens
        with open(cfg_path, "w") as f:
            json.dump({
                "architectures": ["Qwen2_5_VLForConditionalGeneration"],
                "model_type": "qwen2_5_vl",
                "vocab_size": t.vocab_size, "hidden_size": t.hidden_size,
                "intermediate_size": t.intermediate_size,
                "num_hidden_layers": t.num_hidden_layers,
                "num_attention_heads": t.num_attention_heads,
                "num_key_value_heads": t.num_key_value_heads,
                "head_dim": t.head_dim, "rope_theta": t.rope_theta,
                "rms_norm_eps": t.rms_norm_eps,
                "tie_word_embeddings": t.tie_word_embeddings,
                "max_position_embeddings": t.max_position_embeddings,
                "rope_scaling": {"type": "mrope", "mrope_section": list(t.mrope_section)},
                "image_token_id": tok.image_pad, "video_token_id": tok.video_pad,
                "vision_start_token_id": tok.vision_start,
                "vision_end_token_id": tok.vision_end,
                "eos_token_id": tok.eos, "pad_token_id": tok.pad,
                "vision_config": {
                    "depth": v.depth, "hidden_size": v.hidden_size,
                    "intermediate_size": v.intermediate_size, "num_heads": v.num_heads,
                    "in_channels": v.in_channels, "patch_size": v.patch_size,
                    "temporal_patch_size": v.temporal_patch_size,
                    "spatial_merge_size": v.spatial_merge_size,
                    "window_size": v.window_size,
                    "fullatt_block_indexes": list(v.fullatt_block_indexes),
                    "out_hidden_size": v.out_hidden_size, "hidden_act": v.hidden_act,
                },
            }, f, indent=2)
    return path
