"""InternViT vision tower + projector, TPU-native (the second VLM family).

Functional JAX port of the InternVL vision stack (reference family:
vlm_modules/internvl_module.py:17-341 — model classes resolved via HF AutoModel; the
architecture here mirrors transformers' modeling_internvl.py, verified by the parity
test tests/test_internvl_parity.py):

- conv patch embed as a plain matmul over pre-flattened patches (MXU-friendly),
- CLS token + learned absolute position embeddings (no interpolation needed at the
  native tile size — anyres tiles are always image_size x image_size),
- pre-LN blocks with layer-scale (lambda_1/lambda_2), optional QK RMSNorm over the
  full embed dim, full (unwindowed) softmax attention in fp32,
- pixel-shuffle 2x spatial downsample + LayerNorm/MLP projector into the LLM width.

The LLM side reuses the Qwen2.5 decoder (models/decoder.py) with sequential 1D RoPE
(single-section M-RoPE with identical planes) and embeds-input generation — vision
embeddings are merged into <IMG_CONTEXT> positions by models.vlm.vlm_forward.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import InternVitConfig, InternVLVLMConfig
from .vit import layer_norm, rms_norm


def patchify_tiles(tiles_chw: np.ndarray, patch_size: int = 14) -> np.ndarray:
    """(T, C, H, W) float32 tiles -> (T, n_patches, C*p*p) conv-patch layout
    (row-major patches; per-patch flatten order (c, ph, pw) matching conv2d)."""
    T, C, H, W = tiles_chw.shape
    gh, gw = H // patch_size, W // patch_size
    x = tiles_chw.reshape(T, C, gh, patch_size, gw, patch_size)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (T, gh, gw, C, p, p)
    return x.reshape(T, gh * gw, C * patch_size * patch_size)


def init_internvit_params(key, cfg: InternVitConfig, text_hidden: int, dtype=jnp.float32):
    """Random-init InternViT + projector param tree (shape contract for the loaders)."""
    keys = iter(jax.random.split(key, 16 + 12 * cfg.depth))
    H, I, D = cfg.hidden_size, cfg.intermediate_size, cfg.patch_dim
    n_pos = cfg.patches_per_side**2 + 1

    def dense(k, i, o, scale=0.02):
        return (jax.random.normal(k, (i, o)) * scale).astype(dtype)

    blocks = []
    for _ in range(cfg.depth):
        blk = {
            "ln1": {"scale": jnp.ones((H,), dtype), "bias": jnp.zeros((H,), dtype)},
            "ln2": {"scale": jnp.ones((H,), dtype), "bias": jnp.zeros((H,), dtype)},
            "attn": {
                "wq": dense(next(keys), H, H), "wk": dense(next(keys), H, H),
                "wv": dense(next(keys), H, H), "wo": dense(next(keys), H, H),
                "bo": jnp.zeros((H,), dtype),
            },
            "mlp": {
                "w1": dense(next(keys), H, I), "b1": jnp.zeros((I,), dtype),
                "w2": dense(next(keys), I, H), "b2": jnp.zeros((H,), dtype),
            },
            "ls1": jnp.full((H,), cfg.layer_scale_init, dtype),
            "ls2": jnp.full((H,), cfg.layer_scale_init, dtype),
        }
        if cfg.attention_bias:
            blk["attn"]["bq"] = jnp.zeros((H,), dtype)
            blk["attn"]["bk"] = jnp.zeros((H,), dtype)
            blk["attn"]["bv"] = jnp.zeros((H,), dtype)
        if cfg.use_qk_norm:
            blk["attn"]["q_norm"] = jnp.ones((H,), dtype)
            blk["attn"]["k_norm"] = jnp.ones((H,), dtype)
        blocks.append(blk)

    c2 = int(cfg.hidden_size * int(1 / cfg.downsample_ratio) ** 2)
    return {
        "patch_embed": {"kernel": dense(next(keys), D, H), "bias": jnp.zeros((H,), dtype)},
        "cls_token": jnp.zeros((1, 1, H), dtype),
        "pos_embed": (jax.random.normal(next(keys), (1, n_pos, H)) * 0.02).astype(dtype),
        "blocks": blocks,
        "projector": {
            "ln": {"scale": jnp.ones((c2,), dtype), "bias": jnp.zeros((c2,), dtype)},
            "w1": dense(next(keys), c2, text_hidden), "b1": jnp.zeros((text_hidden,), dtype),
            "w2": dense(next(keys), text_hidden, text_hidden), "b2": jnp.zeros((text_hidden,), dtype),
        },
    }


def _act(name: str, x):
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "silu":
        return jax.nn.silu(x)
    raise ValueError(name)


def _norm(cfg: InternVitConfig, p, x):
    if cfg.norm_type == "layer_norm":
        return layer_norm(x, p["scale"], p["bias"], cfg.layer_norm_eps)
    return rms_norm(x, p["scale"], cfg.layer_norm_eps)


def _block(p, cfg: InternVitConfig, x):
    T, S, H = x.shape
    nh, d = cfg.num_heads, cfg.head_dim
    h = _norm(cfg, p["ln1"], x)
    q = h @ p["attn"]["wq"] + p["attn"].get("bq", 0)
    k = h @ p["attn"]["wk"] + p["attn"].get("bk", 0)
    v = h @ p["attn"]["wv"] + p["attn"].get("bv", 0)
    if cfg.use_qk_norm:
        # RMSNorm over the FULL embed dim before the head split (HF InternVLVisionAttention)
        q = rms_norm(q, p["attn"]["q_norm"], cfg.layer_norm_eps)
        k = rms_norm(k, p["attn"]["k_norm"], cfg.layer_norm_eps)
    q = q.reshape(T, S, nh, d)
    k = k.reshape(T, S, nh, d)
    v = v.reshape(T, S, nh, d)
    logits = jnp.einsum("tshd,tzhd->thsz", q, k).astype(jnp.float32) * (d**-0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("thsz,tzhd->tshd", probs.astype(v.dtype), v).reshape(T, S, H)
    attn = attn @ p["attn"]["wo"] + p["attn"]["bo"]
    x = x + p["ls1"] * attn
    h = _norm(cfg, p["ln2"], x)
    h = _act(cfg.hidden_act, h @ p["mlp"]["w1"] + p["mlp"]["b1"]) @ p["mlp"]["w2"] + p["mlp"]["b2"]
    return x + p["ls2"] * h


def pixel_shuffle(feats: jnp.ndarray, scale_factor: float = 0.5) -> jnp.ndarray:
    """(T, W, H, C) -> (T, W*sf, H*sf, C/sf^2) — exact HF op order (modeling_internvl
    pixel_shuffle: view/permute/view/permute)."""
    T, W, H, C = feats.shape
    x = feats.reshape(T, W, int(H * scale_factor), int(C / scale_factor))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(T, int(H * scale_factor), int(W * scale_factor), int(C / (scale_factor**2)))
    return x.transpose(0, 2, 1, 3)


def internvit_embeds(params, cfg: InternVitConfig, patches: jnp.ndarray) -> jnp.ndarray:
    """Packed tiles -> merged LLM-space vision embeddings.

    patches: (T, n_patches, patch_dim) from patchify_tiles (all tiles are the native
    image_size, so position embeddings apply without interpolation).
    Returns (T * num_image_token, text_hidden) in tile order.
    """
    T = patches.shape[0]
    x = patches.astype(params["patch_embed"]["kernel"].dtype) @ params["patch_embed"]["kernel"]
    x = x + params["patch_embed"]["bias"]
    cls = jnp.broadcast_to(params["cls_token"], (T, 1, x.shape[-1]))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)
    for blk in params["blocks"]:
        x = _block(blk, cfg, x)
    feats = x[:, 1:, :]  # drop CLS (vision_feature_select_strategy="default")
    side = cfg.patches_per_side
    feats = feats.reshape(T, side, side, -1)
    feats = pixel_shuffle(feats, cfg.downsample_ratio)
    feats = feats.reshape(T, -1, feats.shape[-1])
    p = params["projector"]
    h = layer_norm(feats, p["ln"]["scale"], p["ln"]["bias"], 1e-5)
    h = _act("gelu", h @ p["w1"] + p["b1"])
    h = h @ p["w2"] + p["b2"]
    return h.reshape(T * h.shape[1], -1)


def init_internvl_params(key, cfg: InternVLVLMConfig, dtype=None):
    """Full random-init InternVL tree: {"vision": InternViT+projector, "text": Qwen2}."""
    from .params import init_text_params

    dtype = dtype or jnp.dtype(cfg.dtype)
    kv, kt = jax.random.split(key)
    return {
        "vision": init_internvit_params(kv, cfg.vision, cfg.text.hidden_size, dtype),
        "text": init_text_params(kt, cfg.text, dtype),
    }


# ---------------------------------------------------------------------------
# HF weight import (for parity tests and released-checkpoint loading)
# ---------------------------------------------------------------------------

def internvit_params_from_hf(hf_model, cfg: InternVitConfig, dtype=jnp.float32):
    """Map a transformers InternVLForConditionalGeneration's vision tower + projector
    into our param tree (torch tensors -> jnp)."""
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}

    def g(name):
        return jnp.asarray(sd[name], dtype)

    pfx = "model.vision_tower."
    conv_w = sd[pfx + "embeddings.patch_embeddings.projection.weight"]  # (H, C, p, p)
    H = conv_w.shape[0]
    kernel = jnp.asarray(conv_w.reshape(H, -1).T, dtype)  # (C*p*p, H) matches patchify layout
    blocks = []
    for i in range(cfg.depth):
        b = f"{pfx}encoder.layer.{i}."
        blk = {
            "ln1": {"scale": g(b + "layernorm_before.weight"), "bias": g(b + "layernorm_before.bias")},
            "ln2": {"scale": g(b + "layernorm_after.weight"), "bias": g(b + "layernorm_after.bias")},
            "attn": {
                "wq": g(b + "attention.q_proj.weight").T,
                "wk": g(b + "attention.k_proj.weight").T,
                "wv": g(b + "attention.v_proj.weight").T,
                "wo": g(b + "attention.projection_layer.weight").T,
                "bo": g(b + "attention.projection_layer.bias"),
            },
            "mlp": {
                "w1": g(b + "mlp.fc1.weight").T, "b1": g(b + "mlp.fc1.bias"),
                "w2": g(b + "mlp.fc2.weight").T, "b2": g(b + "mlp.fc2.bias"),
            },
            "ls1": g(b + "lambda_1"),
            "ls2": g(b + "lambda_2"),
        }
        if cfg.attention_bias:
            blk["attn"]["bq"] = g(b + "attention.q_proj.bias")
            blk["attn"]["bk"] = g(b + "attention.k_proj.bias")
            blk["attn"]["bv"] = g(b + "attention.v_proj.bias")
        if cfg.use_qk_norm:
            blk["attn"]["q_norm"] = g(b + "attention.q_norm.weight")
            blk["attn"]["k_norm"] = g(b + "attention.k_norm.weight")
        blocks.append(blk)
    proj = "model.multi_modal_projector."
    vision = {
        "patch_embed": {"kernel": kernel, "bias": g(pfx + "embeddings.patch_embeddings.projection.bias")},
        "cls_token": g(pfx + "embeddings.cls_token"),
        "pos_embed": g(pfx + "embeddings.position_embeddings"),
        "blocks": blocks,
        "projector": {
            "ln": {"scale": g(proj + "layer_norm.weight"), "bias": g(proj + "layer_norm.bias")},
            "w1": g(proj + "linear_1.weight").T, "b1": g(proj + "linear_1.bias"),
            "w2": g(proj + "linear_2.weight").T, "b2": g(proj + "linear_2.bias"),
        },
    }
    return vision


def internvl_params_from_hf(hf_model, cfg: InternVLVLMConfig, dtype=jnp.float32):
    """Full-tree import: InternViT+projector plus the Qwen2 language model."""
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}

    def g(name):
        return jnp.asarray(sd[name], dtype)

    def lin(name):
        return jnp.asarray(sd[name].T, dtype)

    lm = "model.language_model."
    text = {
        "embed": {"weight": g(lm + "embed_tokens.weight")},
        "layers": [],
        "final_ln": {"scale": g(lm + "norm.weight")},
    }
    for i in range(cfg.text.num_hidden_layers):
        l = f"{lm}layers.{i}."
        text["layers"].append({
            "input_ln": {"scale": g(l + "input_layernorm.weight")},
            "post_ln": {"scale": g(l + "post_attention_layernorm.weight")},
            "attn": {
                "wq": lin(l + "self_attn.q_proj.weight"), "bq": g(l + "self_attn.q_proj.bias"),
                "wk": lin(l + "self_attn.k_proj.weight"), "bk": g(l + "self_attn.k_proj.bias"),
                "wv": lin(l + "self_attn.v_proj.weight"), "bv": g(l + "self_attn.v_proj.bias"),
                "wo": lin(l + "self_attn.o_proj.weight"),
            },
            "mlp": {
                "wg": lin(l + "mlp.gate_proj.weight"),
                "wu": lin(l + "mlp.up_proj.weight"),
                "wd": lin(l + "mlp.down_proj.weight"),
            },
        })
    if not cfg.text.tie_word_embeddings and "lm_head.weight" in sd:
        text["lm_head"] = {"weight": lin("lm_head.weight")}
    return {"vision": internvit_params_from_hf(hf_model, cfg.vision, dtype), "text": text}
