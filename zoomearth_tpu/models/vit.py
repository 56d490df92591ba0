"""Qwen2.5-VL vision tower, TPU-native.

Design vs the reference (modeling_qwen2_vl.py:665-784 and the HF Qwen2.5 variant):

- The conv3d patch embed becomes a plain matmul over pre-flattened patches (the image
  pipeline already emits conv-patch layout) — MXU-friendly, no conv lowering.
- The window permutation, per-block segment ids, and 2D rotary coordinates are computed
  ONCE on host (numpy, `vision_metadata`) from grid_thw — they depend only on image
  shapes, never on pixel data, so the jitted forward takes them as plain int arrays and
  stays shape-static (bucketable).
- Varlen attention (`cu_seqlens` + flash_attn_varlen_func in the reference monkey patch,
  qwen2_5vl_monkey_patch.py:35) becomes segment-id masked attention: window ids for
  windowed blocks, image ids for the full-attention blocks listed in
  `fullatt_block_indexes`.
- Padding to a bucket size is first-class: pad patches carry segment id -1 and are
  dropped after the merger.

Params pytree (see params.init_vision_params for shapes):
  patch_embed.kernel; blocks[i].{norm1,norm2}.scale, .attn.{wqkv,bqkv,wo,bo},
  .mlp.{wg,bg,wu,bu,wd,bd}; merger.ln_q.scale, merger.{w0,b0,w1,b1}
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VisionConfig
from ..ops.flash_attention import PAD_SEG
from ..ops.attention import segment_attention_auto
from .rope import apply_rotary, vision_pos_ids, vision_rope_cos_sin


@dataclasses.dataclass(frozen=True)
class VisionMetadata:
    """Host-computed, shape-static ViT forward metadata for one packed image batch."""

    perm: np.ndarray  # (S,) int32: patch permutation into window order
    inv_perm_merged: np.ndarray  # (S/m²,) int32: merged-token perm back to image order (pads map to the identity tail)
    seg_window: np.ndarray  # (S,) int32 window id per patch (window order); pad = PAD_SEG
    seg_full: np.ndarray  # (S,) int32 image id per patch (window order); pad = PAD_SEG
    pos_ids: np.ndarray  # (S, 2) int32 rotary (h, w) ids per patch (window order)
    num_patches: int  # real (unpadded) patch count
    # Static windowed-attention dispatch (host-derived; see ops.attention):
    # 2 = every aligned 64-row block is exactly one window (uniform grids, e.g. 512px
    # crops) -> block-diagonal reshape attention (window_block_attention);
    # 1 = windows span <= 64 contiguous rows but straddle block edges -> gather into a
    # per-window dense layout via the plan below (gather_window_attention);
    # 0 = fall back to the segment flash kernel.
    win_mode: int = 0
    # win_mode 1 gather plan (gather_window_attention): source rows, key validity,
    # scatter-back slots. None unless win_mode == 1.
    win_gidx: np.ndarray | None = None  # (NW*64,) int32
    win_valid: np.ndarray | None = None  # (NW, 64) bool
    win_sidx: np.ndarray | None = None  # (S,) int32


def window_index(grid_thw: Sequence[Sequence[int]], cfg: VisionConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Per merged-token window permutation + window id, concatenated over images.

    Returns (index, window_ids) both of length sum(t*h*w)/merge_unit. `index` lists
    merged-token indices in window-major order; `window_ids` is the window id of each
    listed token (globally unique across images).
    """
    vit_ws = cfg.window_size // cfg.spatial_merge_size // cfg.patch_size  # merged tokens per window side
    index_out, wid_out = [], []
    base = 0
    wid_base = 0
    for t, h, w in grid_thw:
        llm_h, llm_w = h // cfg.spatial_merge_size, w // cfg.spatial_merge_size
        idx = np.arange(t * llm_h * llm_w).reshape(t, llm_h, llm_w)
        pad_h = (-llm_h) % vit_ws
        pad_w = (-llm_w) % vit_ws
        nwh, nww = (llm_h + pad_h) // vit_ws, (llm_w + pad_w) // vit_ws
        padded = np.full((t, llm_h + pad_h, llm_w + pad_w), -100, dtype=np.int64)
        padded[:, :llm_h, :llm_w] = idx
        padded = padded.reshape(t, nwh, vit_ws, nww, vit_ws).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t * nwh * nww, vit_ws * vit_ws)
        wids = np.broadcast_to(np.arange(padded.shape[0])[:, None], padded.shape)
        keep = padded != -100
        index_out.append(padded[keep] + base)
        wid_out.append(wids[keep] + wid_base)
        base += t * llm_h * llm_w
        wid_base += padded.shape[0]
    return np.concatenate(index_out), np.concatenate(wid_out)


def vision_metadata(
    grid_thw: Sequence[Sequence[int]], cfg: VisionConfig, pad_to: int = 0
) -> VisionMetadata:
    """Compute all host-side metadata for a packed batch of image grids.

    pad_to: optionally pad the patch dimension to this bucket size (multiple of
    merge_unit); pad patches get segment id PAD_SEG (sorts last, keeping ids ascending
    for the flash kernel) so attention isolates them.

    Memoized on (grids, cfg, pad_to): metadata depends only on image SHAPES, which
    bucket to a handful of values in steady state (e.g. every 512px crop is (1,36,36)),
    so repeat waves skip the numpy work entirely. Treat results as read-only.
    """
    key = (tuple(tuple(int(v) for v in g) for g in grid_thw), cfg, int(pad_to))
    return _vision_metadata_cached(key)


@functools.lru_cache(maxsize=256)
def _vision_metadata_cached(key) -> VisionMetadata:
    grid_thw, cfg, pad_to = key
    m2 = cfg.merge_unit
    n_patches = sum(t * h * w for t, h, w in grid_thw)
    if len(cfg.fullatt_block_indexes) >= cfg.depth:
        # Window-free family (Qwen2-VL): no reorder; every "window" is the image.
        n_merged = n_patches // m2
        midx = np.arange(n_merged)
        wids = np.concatenate(
            [np.full(t * h * w // m2, i) for i, (t, h, w) in enumerate(grid_thw)]
        )
    else:
        midx, wids = window_index(grid_thw, cfg)  # merged-token level
    # Expand merged-token permutation to patch level: merged token j covers patches
    # [j*m2, (j+1)*m2) in emission order.
    perm = (midx[:, None] * m2 + np.arange(m2)[None, :]).reshape(-1)
    seg_window = np.repeat(wids, m2)
    # image id per merged token (in image order), then permuted to window order
    img_ids_merged = np.concatenate(
        [np.full(t * h * w // m2, i) for i, (t, h, w) in enumerate(grid_thw)]
    )
    seg_full = np.repeat(img_ids_merged[midx], m2)
    pos = vision_pos_ids(grid_thw, cfg.spatial_merge_size)[perm]  # window order
    inv_perm_merged = np.argsort(midx)

    if pad_to and pad_to > n_patches:
        pad_n = pad_to - n_patches
        assert pad_n % m2 == 0, "bucket size must be a multiple of merge_unit"
        perm = np.concatenate([perm, np.arange(n_patches, pad_to)])
        seg_window = np.concatenate([seg_window, np.full(pad_n, PAD_SEG)])
        seg_full = np.concatenate([seg_full, np.full(pad_n, PAD_SEG)])
        pos = np.concatenate([pos, np.zeros((pad_n, 2), dtype=pos.dtype)])
        # Pad the merged-token inverse permutation too (identity tail: pad patches sit
        # at the window-order tail, so pad merged-token j maps to itself). This keeps
        # the ViT OUTPUT row count at pad_to/m2 — a function of the BUCKET, not of the
        # real image mix. Sized-by-real-count output made every downstream program
        # (engine pool prefill, eval batches) recompile whenever the number of images
        # in a batch changed, silently defeating the patch buckets.
        n_merged = n_patches // m2
        inv_perm_merged = np.concatenate(
            [inv_perm_merged, np.arange(n_merged, pad_to // m2)]
        )

    # windowed-attention mode (static, drives which attention program compiles):
    # window_index emits each window as a contiguous ascending run, so a segment's
    # span equals its patch count; the pad tail is one long PAD_SEG run whose output
    # rows are dropped downstream (locality there is irrelevant).
    win_mode = 0
    win_gidx = win_valid = win_sidx = None
    S_total = len(seg_window)
    from ..ops.attention import LOCAL_BLOCK

    if S_total % LOCAL_BLOCK == 0 and S_total > 0:
        blocks = seg_window.reshape(-1, LOCAL_BLOCK)
        first = blocks[:, 0]
        # uniform: each aligned block holds exactly one segment AND no segment spans
        # two blocks (adjacent equal ids are only allowed for the PAD tail — a whole-
        # image segment, e.g. the window-free Qwen2-VL family, is NOT uniform)
        uniform = bool(np.all(blocks == blocks[:, :1])) and bool(
            np.all((first[1:] != first[:-1]) | (first[1:] == PAD_SEG))
        )
        if uniform:
            win_mode = 2
        else:
            real = seg_window[seg_window != PAD_SEG]
            if real.size and np.bincount(real - real.min()).max() <= LOCAL_BLOCK:
                plan = _window_gather_plan(seg_window, LOCAL_BLOCK)
                if plan is not None:
                    win_mode = 1
                    win_gidx, win_valid, win_sidx = plan

    return VisionMetadata(
        perm=perm.astype(np.int32),
        inv_perm_merged=inv_perm_merged.astype(np.int32),
        seg_window=seg_window.astype(np.int32),
        seg_full=seg_full.astype(np.int32),
        pos_ids=pos.astype(np.int32),
        num_patches=n_patches,
        win_mode=win_mode,
        win_gidx=win_gidx,
        win_valid=win_valid,
        win_sidx=win_sidx,
    )


def _window_gather_plan(seg: np.ndarray, lmax: int):
    """Gather plan for gather_window_attention: split the contiguous ascending runs of
    `seg` into pseudo-windows of <= lmax rows (only the PAD tail run can exceed lmax —
    splitting it is safe because pad outputs are dropped), then emit (gidx, valid, sidx).
    Returns None when the padded layout would more than double the row count (degenerate
    many-tiny-window batches stay on the flash kernel)."""
    S = len(seg)
    bounds = np.flatnonzero(np.diff(seg)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [S]])
    pieces = []
    for st, en in zip(starts, ends):
        for off in range(int(st), int(en), lmax):
            pieces.append((off, min(lmax, int(en) - off)))
    nw = len(pieces)
    if nw * lmax > 2 * S:
        return None
    gidx = np.zeros((nw, lmax), np.int32)
    valid = np.zeros((nw, lmax), bool)
    sidx = np.zeros((S,), np.int32)
    for w, (st, ln) in enumerate(pieces):
        gidx[w, :ln] = np.arange(st, st + ln)
        valid[w, :ln] = True
        sidx[st : st + ln] = w * lmax + np.arange(ln)
    return gidx.reshape(-1), valid, sidx


def rms_norm(x, scale, eps):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(dtype) * scale


def layer_norm(x, scale, bias, eps):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return ((x - mean) * jax.lax.rsqrt(var + eps)).astype(dtype) * scale + bias


def _vit_norm(p, cfg: VisionConfig, x):
    if cfg.norm_type == "layer":
        return layer_norm(x, p["scale"], p["bias"], 1e-6)
    return rms_norm(x, p["scale"], cfg.rms_norm_eps)


def _vit_mlp(p, cfg: VisionConfig, h):
    if cfg.mlp_type == "gelu_fc":
        # Qwen2-VL VisionMlp: fc1 -> act -> fc2 (reference modeling_qwen2_vl.py:298-313)
        z = h @ p["w1"] + p["b1"]
        if cfg.hidden_act == "quick_gelu":
            z = z * jax.nn.sigmoid(1.702 * z)
        else:
            z = jax.nn.gelu(z, approximate=False)
        return z @ p["w2"] + p["b2"]
    g = jax.nn.silu(h @ p["wg"] + p["bg"])
    u = h @ p["wu"] + p["bu"]
    return (g * u) @ p["wd"] + p["bd"]


def _vit_block(params, cfg: VisionConfig, x, seg, cos, sin, attn_fn=segment_attention_auto):
    """One ViT block: norm -> segment attention (2D RoPE) -> norm -> MLP.

    Norm/MLP flavor per cfg (Qwen2.5-VL: RMSNorm+SwiGLU; Qwen2-VL: LayerNorm+GELU fc)."""
    S = x.shape[0]
    h = _vit_norm(params["norm1"], cfg, x)
    qkv = h @ params["attn"]["wqkv"] + params["attn"]["bqkv"]
    qkv = qkv.reshape(S, 3, cfg.num_heads, cfg.head_dim)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    q = apply_rotary(q, cos, sin)
    k = apply_rotary(k, cos, sin)
    attn = attn_fn(q, k, v, seg)
    attn = attn.reshape(S, cfg.hidden_size) @ params["attn"]["wo"] + params["attn"]["bo"]
    x = x + attn
    h = _vit_norm(params["norm2"], cfg, x)
    x = x + _vit_mlp(params["mlp"], cfg, h)
    return x


def vit_forward(
    params,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,  # (S, patch_dim) — conv-patch layout from preprocess
    perm: jnp.ndarray,  # (S,) metadata arrays (device copies of VisionMetadata)
    inv_perm_merged: jnp.ndarray,  # (S/m²,) — bucket-sized; pad rows map to themselves
    seg_window: jnp.ndarray,  # (S,)
    seg_full: jnp.ndarray,  # (S,)
    pos_ids: jnp.ndarray,  # (S, 2)
    win_mode: int = 0,  # STATIC VisionMetadata.win_mode (windowed-attention dispatch)
    win_plan=None,  # (win_gidx, win_valid, win_sidx) device arrays; required iff win_mode == 1
) -> jnp.ndarray:
    """Packed ViT forward -> (S_real/m², out_hidden_size) merged vision embeddings
    in original image order.

    S may exceed the real patch count (bucketed); pad rows are isolated by seg=-1.
    The output has S/m² rows — real merged tokens first (image order), pad rows at the
    tail — so the output SHAPE depends only on the bucket, never on the image mix
    (callers gather only the leading real rows via the image-pad positions).

    pixel_values may be uint8 (raw bytes from preprocess_image_u8 — 4x cheaper on the
    host->device link): CLIP normalization then runs here, in the numpy op order
    (x/255, minus mean, divide std, per channel) so results match the host fp32 path.
    """
    if pixel_values.dtype == jnp.uint8:
        from ..image.preprocess import IMAGE_MEAN, IMAGE_STD

        reps = pixel_values.shape[-1] // cfg.in_channels  # temporal*patch² per channel
        mean_col = jnp.asarray(np.repeat(IMAGE_MEAN, reps), jnp.float32)
        std_col = jnp.asarray(np.repeat(IMAGE_STD, reps), jnp.float32)
        pixel_values = (pixel_values.astype(jnp.float32) / 255.0 - mean_col) / std_col
    kernel = params["patch_embed"]["kernel"]
    if pixel_values.shape[-1] != kernel.shape[0]:
        # COMPACT single-frame patches (preprocess_image_u8 compact=True): the host
        # sent [C, 1, ps, ps] bytes instead of the temporally-repeated [C, T, ps, ps].
        # A still image's temporal copies are identical, so the patch embed folds:
        # x_dup @ K == x_compact @ (sum over K's temporal row-slices). Kernel rows
        # are grouped [C, T, ps*ps] (preprocess.patchify layout).
        t_rep = kernel.shape[0] // pixel_values.shape[-1]
        per_ch = pixel_values.shape[-1] // cfg.in_channels
        folded = kernel.astype(jnp.float32).reshape(cfg.in_channels, t_rep, per_ch, -1)
        kernel = folded.sum(axis=1).reshape(cfg.in_channels * per_ch, -1).astype(kernel.dtype)
    x = pixel_values.astype(kernel.dtype) @ kernel
    x = jnp.take(x, perm, axis=0)  # into window order
    cos, sin = vision_rope_cos_sin(pos_ids, cfg.head_dim)
    if win_mode == 2:
        from ..ops.attention import window_block_attention

        win_attn = lambda q, k, v, seg: window_block_attention(q, k, v)
    elif win_mode == 1:
        from ..ops.attention import gather_window_attention

        gp, vp, sp = win_plan
        win_attn = lambda q, k, v, seg: gather_window_attention(q, k, v, gp, vp, sp)
    else:
        win_attn = segment_attention_auto
    for i in range(cfg.depth):
        if i in cfg.fullatt_block_indexes:
            seg, attn_fn = seg_full, segment_attention_auto
        else:
            seg, attn_fn = seg_window, win_attn
        x = _vit_block(params["blocks"][i], cfg, x, seg, cos, sin, attn_fn)
    # Patch merger: norm then merge each group of merge_unit consecutive patches
    # (consecutive in window order — matches HF), then 2-layer MLP.
    x = _vit_norm(params["merger"]["ln_q"], cfg, x)
    x = x.reshape(-1, cfg.merge_unit * cfg.hidden_size)
    x = jax.nn.gelu(x @ params["merger"]["w0"] + params["merger"]["b0"], approximate=False)
    x = x @ params["merger"]["w1"] + params["merger"]["b1"]
    return jnp.take(x, inv_perm_merged, axis=0)  # image order; pad rows at the tail
