"""int8 serving accuracy bound WITHOUT real weights (VERDICT r4 item 5).

The throughput bench serves int8 weight-only (+ int8 lm_head since r4); the
real-weights accuracy gate (PARITY.md runbook step 5) is blocked on having a
checkpoint on disk. This probe bounds the quantization risk with what IS available:
at the mid-size parity config (tests/test_midsize_parity.py — 8 GQA decoder layers,
8-block windowed ViT, the same config whose bf16 greedy tokens are verified identical
to HF), measure over a few hundred synthetic two-image episodes:

  - greedy-token FLIP RATE of int8-weights vs bf16 (per position, up to first EOS),
  - first-token logit MAE / max-abs-diff,
  - the same for int8+int8-lm_head (the bench default).

Random weights are the PESSIMISTIC case for flip rate: trained logit margins at the
argmax are typically much larger than at random init (where near-ties dominate), so
the trained flip rate should be lower than measured here. Results are published in
BASELINE.md next to the bench numbers.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/probe_int8_fliprate.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from zoomearth_tpu.config import SpecialTokens, TextConfig, VisionConfig, VLMConfig, databank_id
from zoomearth_tpu.models.params import init_vlm_params
from zoomearth_tpu.ops.quant import fuse_decoder_matmuls, quantize_decoder_int8
from zoomearth_tpu.runtime.generate import GenerationConfig, Generator, prepare_batch

B = int(os.environ.get("FLIP_BATCH", "16"))
ROUNDS = int(os.environ.get("FLIP_ROUNDS", "20"))  # episodes = B * ROUNDS
NEW_TOKENS = int(os.environ.get("FLIP_NEW_TOKENS", "24"))
VOCAB = 512


def midsize_cfg():
    """Same shape as tests/test_midsize_parity.py::_midsize_cfg (HF-parity-verified)."""
    vision = VisionConfig(
        depth=8, hidden_size=64, intermediate_size=128, num_heads=4,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
        window_size=56, fullatt_block_indexes=(3, 7), out_hidden_size=128,
    )
    text = TextConfig(
        vocab_size=VOCAB, hidden_size=128, intermediate_size=256,
        num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True, mrope_section=(2, 3, 3),
    )
    tokens = SpecialTokens(
        image_pad=databank_id(VOCAB, 0), video_pad=databank_id(VOCAB, 1),
        vision_start=databank_id(VOCAB, 2), vision_end=databank_id(VOCAB, 3),
        im_start=databank_id(VOCAB, 4), im_end=databank_id(VOCAB, 5),
        endoftext=databank_id(VOCAB, 6), eos=databank_id(VOCAB, 5),
    )
    return VLMConfig(vision=vision, text=text, tokens=tokens, dtype="bfloat16")


def build_batch(cfg, rng, grid=(1, 4, 4)):
    tok = cfg.tokens
    n_img = (grid[0] * grid[1] * grid[2]) // cfg.vision.merge_unit
    seqs, imgs = [], []
    for b in range(B):
        pv = rng.standard_normal((grid[0] * grid[1] * grid[2], cfg.vision.patch_dim)).astype(np.float32)
        ids = ([tok.im_start] + list(rng.integers(1, 400, size=6 + b % 5))
               + [tok.vision_start] + [tok.image_pad] * n_img + [tok.vision_end]
               + list(rng.integers(1, 400, size=10)))
        seqs.append(ids)
        imgs.append([(pv, grid)])
    n_patches = B * grid[0] * grid[1] * grid[2]
    return prepare_batch(cfg, seqs, imgs, length_buckets=(64,), patch_buckets=(n_patches,))


def flip_stats(gen_ref, gen_q, cfg, seed0):
    """Greedy decode both variants over ROUNDS batches; returns flip metrics.

    token_flip_rate is CASCADE-INFLATED: one early argmax flip rewrites the whole
    suffix (autoregressive divergence), so it bounds trajectory divergence, not
    per-position error. first_token_flip_rate is the clean per-position estimate
    (no cascade), to be read against the bf16 argmax margin distribution."""
    g = GenerationConfig(max_new_tokens=NEW_TOKENS, temperature=0.0)
    flips = comps = 0
    row_flip = first_flips = 0
    rows = 0
    logit_mae = []
    logit_max = []
    margins = []
    for r in range(ROUNDS):
        rng = np.random.default_rng(seed0 + r)
        batch = build_batch(cfg, rng)
        l_ref, c_ref, a_ref = gen_ref.run_prefill(batch, max_new=NEW_TOKENS)
        l_q, c_q, a_q = gen_q.run_prefill(batch, max_new=NEW_TOKENS)
        lr = np.asarray(l_ref, np.float32)
        lq = np.asarray(l_q, np.float32)
        logit_mae.append(float(np.abs(lr - lq).mean()))
        logit_max.append(float(np.abs(lr - lq).max()))
        first_flips += int((lr.argmax(-1) != lq.argmax(-1)).sum())
        top2 = np.partition(lr, -2, axis=-1)[:, -2:]
        margins.extend((top2[:, 1] - top2[:, 0]).tolist())  # argmax margin per row
        t_ref, _ = gen_ref.run_decode(l_ref, c_ref, batch.next_pos, g, attend=a_ref)
        t_q, _ = gen_q.run_decode(l_q, c_q, batch.next_pos, g, attend=a_q)
        out_ref = gen_ref.trim_generated(np.asarray(t_ref))
        out_q = gen_q.trim_generated(np.asarray(t_q))
        for a, b in zip(out_ref, out_q):
            n = min(len(a), len(b))
            flips += sum(x != y for x, y in zip(a[:n], b[:n])) + abs(len(a) - len(b))
            comps += max(len(a), len(b))
            row_flip += a != b
            rows += 1
    margins = np.asarray(margins)
    return {
        "episodes": rows,
        "first_token_flip_rate": round(first_flips / max(rows, 1), 5),
        "token_flip_rate_cascaded": round(flips / max(comps, 1), 5),
        "episode_flip_rate": round(row_flip / max(rows, 1), 5),
        "first_logit_mae": round(float(np.mean(logit_mae)), 6),
        "first_logit_maxabs": round(float(np.max(logit_max)), 5),
        "bf16_argmax_margin_p50": round(float(np.percentile(margins, 50)), 5),
        "bf16_argmax_margin_p10": round(float(np.percentile(margins, 10)), 5),
    }


def main():
    cfg = midsize_cfg()
    params = init_vlm_params(jax.random.key(0), cfg, dtype="bfloat16")
    params = fuse_decoder_matmuls(params)
    p_int8 = quantize_decoder_int8(params, lm_head=False)
    p_int8_lm = quantize_decoder_int8(params, lm_head=True)

    # dtype-noise floor: the same weights in fp32 vs served bf16 — flips at this
    # level are the cost of bf16 itself, not of int8 quantization
    p_fp32 = jax.tree.map(lambda a: a.astype(np.float32), params)

    gen_ref = Generator(params, cfg, max_cache_len=256, cache_dtype="bfloat16")
    gen_q = Generator(p_int8, cfg, max_cache_len=256, cache_dtype="bfloat16")
    gen_qlm = Generator(p_int8_lm, cfg, max_cache_len=256, cache_dtype="bfloat16")
    gen_f32 = Generator(p_fp32, cfg, max_cache_len=256, cache_dtype="bfloat16")

    t0 = time.time()
    res = {
        "config": "midsize (8L GQA decoder, 8-block ViT, vocab 512, bf16 activations)",
        "episodes_per_variant": B * ROUNDS,
        "new_tokens": NEW_TOKENS,
        "int8_weights": flip_stats(gen_ref, gen_q, cfg, seed0=100),
        "int8_weights_plus_lm_head": flip_stats(gen_ref, gen_qlm, cfg, seed0=100),
        "bf16_vs_fp32_floor": flip_stats(gen_ref, gen_f32, cfg, seed0=100),
        "note": "random init = pessimistic flip rate (argmax margins are smallest there)",
        "elapsed_s": None,
    }
    res["elapsed_s"] = round(time.time() - t0, 1)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
