"""Scan-slope the REAL prefill programs (gen1 embeds-path prefill, stage-2 chunk
prefill incl. crop ViT) at bench shapes (B=48), to split device time from
dispatch and locate in-model overhead beyond the per-layer costs
(scripts/probe_prefill.py measured: layer full 39.6 ms -> x36 = 1.43 s, ViT block
23.6 ms -> x32 = 0.75 s)."""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.decoder import KVCache
from zoomearth_tpu.runtime.generate import (
    GenerationConfig, Generator, prepare_batch, prepare_continuation,
)
from zoomearth_tpu.ops.quant import fuse_decoder_matmuls, quantize_decoder_int8
from __graft_entry__ import _zero_params

cfg = VLMConfig.qwen2_5_vl_3b()
tok = cfg.tokens
B = 48
print(f"device: {jax.devices()[0]}", file=sys.stderr)

params = _zero_params(cfg, jnp.bfloat16)
params = fuse_decoder_matmuls(params)
params = quantize_decoder_int8(params)
g = Generator(params, cfg, max_cache_len=1536, cache_dtype=jnp.bfloat16)
rng = np.random.default_rng(0)

# --- gen1 prefill batch (embeds path, like the bench's cached-ViT stage 1) ---
n_img = 324
token_lists = []
for _ in range(B):
    ids = ([tok.im_start] + list(rng.integers(100, 100000, size=20))
           + [tok.vision_start] + [tok.image_pad] * n_img + [tok.vision_end]
           + list(rng.integers(100, 100000, size=350)))
    token_lists.append(ids)
b1 = prepare_batch(cfg, token_lists, [[((np.zeros((1296, 1176), np.uint8)), (1, 36, 36))]] * B)
embeds = jnp.zeros((B * n_img, cfg.text.hidden_size), jnp.bfloat16)
ids1 = jnp.asarray(b1.input_ids)
lens1 = jnp.asarray(b1.lengths)
pos1 = jnp.asarray(b1.position_ids)
S1 = ids1.shape[1]
print(f"gen1: S={S1} lengths[0]={int(b1.lengths[0])}", file=sys.stderr)

# --- stage-2 chunk batch (real crop ViT: 1024 patches/row) -------------------
chunks, chunk_imgs, starts = [], [], []
pv2 = rng.integers(0, 255, (1024, 1176), dtype=np.uint8)
for i in range(B):
    n2 = 1024 // cfg.vision.merge_unit
    chunks.append([tok.vision_start] + [tok.image_pad] * n2 + [tok.vision_end])
    chunk_imgs.append([(pv2, (1, 32, 32))])
    starts.append(700)
bc = prepare_continuation(cfg, chunks, chunk_imgs, starts)
ids2 = jnp.asarray(bc.input_ids)
lens2 = jnp.asarray(bc.lengths)
pos2 = jnp.asarray(bc.position_ids)
pvs2 = jnp.asarray(bc.pixel_values)
meta2 = {k: jnp.asarray(v) for k, v in bc.vision_meta.items()}
keep = jnp.full((B,), 860, jnp.int32)
S2 = ids2.shape[1]
print(f"chunk: S={S2} patches={pvs2.shape}", file=sys.stderr)


def run(fn, args, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def slope(label, make, n1=3, n2=12):
    t_c = time.time()
    f1, f2 = make(n1), make(n2)
    t1 = run(f1, ())
    t2 = run(f2, ())
    per = (t2 - t1) / (n2 - n1)
    print(f"[{label}] N{n1}={t1:.3f}s N{n2}={t2:.3f}s -> {per*1e3:.1f} ms/pass, "
          f"overhead {t1 - n1*per:.3f}s (compile+measure {time.time()-t_c:.0f}s)",
          flush=True)
    return per


def make_gen1(n):
    pre = functools.partial(g._prefill, use_flash=True)

    def fn():
        def body(cache, _):
            last, cache = pre(params, ids1, lens1, pos1, embeds, None, cache)
            return cache, last[0, 0]

        cache0 = KVCache.create(cfg.text, B, 1536, jnp.bfloat16)
        cache, outs = jax.lax.scan(body, cache0, None, length=n)
        return jnp.sum(outs) + jnp.sum(cache.k[0][0, 0, 0])

    return jax.jit(fn)


def make_chunk(n, with_vision=True):
    pre = functools.partial(g._chunk_prefill, use_flash=True, grow_to=None)
    pv = pvs2 if with_vision else jnp.zeros((B * (1024 // 4), cfg.text.hidden_size), jnp.bfloat16)
    meta = meta2 if with_vision else None

    def fn():
        def body(cache, _):
            logits, cache = pre(params, ids2, lens2, keep, pos2, pv, meta, cache)
            return cache, logits[0, 0]

        cache0 = KVCache.create(cfg.text, B, 1536, jnp.bfloat16)
        cache, outs = jax.lax.scan(body, cache0, None, length=n)
        return jnp.sum(outs) + jnp.sum(cache.k[0][0, 0, 0])

    return jax.jit(fn)


def main():
    p1 = slope("gen1_prefill", make_gen1)
    p2 = slope("chunk_prefill_vit", make_chunk)
    p3 = slope("chunk_prefill_embeds", lambda n: make_chunk(n, with_vision=False))
    print("\n--- conclusions ---")
    print(f"gen1 prefill device: {p1:.3f} s/pass (layers predict 1.43 s)")
    print(f"chunk prefill device: {p2:.3f} s/pass; ViT share {p2-p3:.3f} s "
          f"(blocks predict 0.75 s)")
    print(f"chunk decoder-side: {p3:.3f} s/pass")


if __name__ == "__main__":
    main()
