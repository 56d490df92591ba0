"""Combined VLM: ViT vision embeddings merged into the token stream + decoder forward.

Equivalent of the reference Qwen2VLForConditionalGeneration forward
(modeling_qwen2_vl.py:1289-1455): embed tokens, run the ViT over packed pixel patches,
scatter the merged vision embeddings into the <|image_pad|> positions, run the decoder,
project to logits. Loss applies the -100 label-masking convention
(modeling_qwen2_vl.py:1435-1446).

The scatter is done with a cumsum-gather instead of boolean masked_scatter so shapes
stay static under jit: image-pad slot j (in flattened batch order) reads vision
embedding row j.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VLMConfig
from .decoder import KVCache, decoder_forward, logits_from_hidden
from .vit import vit_forward


def embed_tokens(params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["text"]["embed"]["weight"], input_ids, axis=0)


def merge_vision_embeddings(
    token_embeds: jnp.ndarray,  # (B, S, E)
    vision_embeds: jnp.ndarray,  # (N_img_tokens, E) in image order
    is_image: jnp.ndarray,  # (B, S) bool — True at <|image_pad|> positions
) -> jnp.ndarray:
    """Replace image-pad token embeddings with vision embeddings (order-preserving)."""
    B, S, E = token_embeds.shape
    flat_img = is_image.reshape(-1)
    # slot j among image positions (flattened order) <- vision row j
    img_idx = jnp.cumsum(flat_img) - 1
    img_idx = jnp.clip(img_idx, 0, vision_embeds.shape[0] - 1)
    gathered = jnp.take(vision_embeds, img_idx, axis=0)
    out = jnp.where(flat_img[:, None], gathered.astype(token_embeds.dtype), token_embeds.reshape(-1, E))
    return out.reshape(B, S, E)


def vlm_forward(
    params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,  # (B, S)
    position_ids: jnp.ndarray,  # (3, B, S)
    pixel_values: Optional[jnp.ndarray] = None,  # (N_patches, patch_dim) packed
    vision_meta: Optional[dict] = None,  # device arrays from VisionMetadata
    attn_positions: Optional[jnp.ndarray] = None,
    attn_valid: Optional[jnp.ndarray] = None,
    cache: Optional[KVCache] = None,
    update_cache_len: bool = True,
    logit_index: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
    write_pos: Optional[jnp.ndarray] = None,
    vision_embeds: Optional[jnp.ndarray] = None,
    win_mode: int = 0,  # STATIC VisionMetadata.win_mode (ViT windowed-attention path)
    attend_len: Optional[int] = None,  # STATIC decode attention prefix (decoder_forward)
):
    """Full forward -> (logits float32, new_cache).

    Vision input: either raw `pixel_values` (+ vision_meta) — the ViT runs inside this
    program — or precomputed `vision_embeds` (N_merged, E) from compute_vision_embeds.
    The split form lets callers compile the ViT once per patch bucket and share it
    across every prompt-shape variant (engine prefill shapes would otherwise each
    re-compile the 32-block tower), and enables per-image embedding caches.

    logits is (B, S, V), or (B, V) when logit_index (B,) is given — then only that
    position's hidden state is projected (prefill needs just the last valid token;
    projecting all positions would materialize a (B, S, V) fp32 tensor, ~5 GB at 3B
    scale for S=1024)."""
    x = embed_tokens(params, input_ids)
    if pixel_values is not None and vision_embeds is None:
        vision_embeds = vit_forward(
            params["vision"],
            cfg.vision,
            pixel_values,
            vision_meta["perm"],
            vision_meta["inv_perm_merged"],
            vision_meta["seg_window"],
            vision_meta["seg_full"],
            vision_meta["pos_ids"],
            win_mode=win_mode,
            win_plan=_win_plan(vision_meta),
        )
    if vision_embeds is not None:
        is_image = input_ids == cfg.tokens.image_pad
        x = merge_vision_embeddings(x, vision_embeds, is_image)
    hidden, new_cache = decoder_forward(
        params["text"],
        cfg.text,
        x,
        position_ids,
        attn_positions=attn_positions,
        attn_valid=attn_valid,
        cache=cache,
        update_cache_len=update_cache_len,
        use_flash=use_flash,
        write_pos=write_pos,
        attend_len=attend_len,
    )
    if logit_index is not None:
        hidden = jnp.take_along_axis(hidden, logit_index[:, None, None], axis=1)[:, 0]
    logits = logits_from_hidden(params["text"], cfg.text, hidden)
    return logits, new_cache


def masked_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = -100):
    """Next-token CE with -100 masking (reference modeling_qwen2_vl.py:1435-1446).

    logits (B, S, V) float32, labels (B, S). Shifts internally: logits[:, :-1] predict
    labels[:, 1:]. Returns (mean_loss, num_valid_tokens).
    """
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n = jnp.maximum(valid.sum(), 1)
    loss = -(tok_logp * valid).sum() / n
    return loss, valid.sum()


def _win_plan(vision_meta: dict):
    """Extract the win_mode-1 gather plan from a device meta dict (None if absent)."""
    if "win_gidx" in vision_meta:
        return (vision_meta["win_gidx"], vision_meta["win_valid"], vision_meta["win_sidx"])
    return None


def compute_vision_embeds(params, cfg: VLMConfig, pixel_values, vision_meta, win_mode: int = 0):
    """Run just the vision tower: packed patches -> (N_merged, E) merged embeddings in
    image order. Jit this separately (keyed by the patch bucket AND win_mode) so
    prompt-shape variants share one compiled ViT."""
    return vit_forward(
        params["vision"], cfg.vision, pixel_values,
        vision_meta["perm"], vision_meta["inv_perm_merged"],
        vision_meta["seg_window"], vision_meta["seg_full"], vision_meta["pos_ids"],
        win_mode=win_mode, win_plan=_win_plan(vision_meta),
    )


def vision_meta_to_device(meta) -> dict:
    """VisionMetadata (numpy) -> dict of device arrays for vlm_forward."""
    out = {
        "perm": jnp.asarray(meta.perm),
        "inv_perm_merged": jnp.asarray(meta.inv_perm_merged),
        "seg_window": jnp.asarray(meta.seg_window),
        "seg_full": jnp.asarray(meta.seg_full),
        "pos_ids": jnp.asarray(meta.pos_ids),
    }
    if meta.win_gidx is not None:
        out["win_gidx"] = jnp.asarray(meta.win_gidx)
        out["win_valid"] = jnp.asarray(meta.win_valid)
        out["win_sidx"] = jnp.asarray(meta.win_sidx)
    return out
