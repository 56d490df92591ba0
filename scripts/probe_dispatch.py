"""Quantify per-call dispatch/argument overhead on the axon tunnel.

probe_programs.py showed the REAL prefill programs run 1.42 s (gen1) / 1.61 s
(chunk) on device when scanned with on-device args — yet the bench observes
~2.5 s / ~3.4 s per call. This measures where the extra ~1 s/call goes:

1. trivial jitted fn taking the FULL ~800-leaf params tree as an argument,
   vs the same fn with params captured as constants -> per-call arg-tree cost;
2. a real Generator.generate() call sequence at bench shapes (fixed 160-token
   decode) decomposed into prefill-device + decode-steps + residual overhead.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.runtime.generate import GenerationConfig, Generator, prepare_batch
from zoomearth_tpu.ops.quant import fuse_decoder_matmuls, quantize_decoder_int8
from __graft_entry__ import _zero_params

cfg = VLMConfig.qwen2_5_vl_3b()
tok = cfg.tokens
B = 48
print(f"device: {jax.devices()[0]}", file=sys.stderr)

params = _zero_params(cfg, jnp.bfloat16)
params = fuse_decoder_matmuls(params)
params = quantize_decoder_int8(params)
n_leaves = len(jax.tree.leaves(params))
print(f"param leaves: {n_leaves}", file=sys.stderr)


def timed(label, fn, reps=6):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn())
        ts.append(time.time() - t0)
    best = min(ts[1:])  # drop first (compile)
    print(f"[{label}] best {best*1e3:.1f} ms (all: {[f'{t:.3f}' for t in ts]})",
          flush=True)
    return best


# --- 1. arg-tree cost --------------------------------------------------------
x0 = jnp.zeros((8,), jnp.float32)
f_args = jax.jit(lambda p, x: x + p["text"]["embed"]["weight"][0, 0].astype(jnp.float32))
f_const = jax.jit(lambda x: x + params["text"]["embed"]["weight"][0, 0].astype(jnp.float32))
t_args = timed("trivial(params-as-args)", lambda: f_args(params, x0))
t_const = timed("trivial(params-captured)", lambda: f_const(x0))
print(f"arg-tree overhead per call: {(t_args - t_const)*1e3:.1f} ms", flush=True)

# --- 2. real generate() decomposition ---------------------------------------
g = Generator(params, cfg, max_cache_len=1536, cache_dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
n_img = 324
token_lists = []
for _ in range(B):
    ids = ([tok.im_start] + list(rng.integers(100, 100000, size=20))
           + [tok.vision_start] + [tok.image_pad] * n_img + [tok.vision_end]
           + list(rng.integers(100, 100000, size=350)))
    token_lists.append(ids)
b1 = prepare_batch(cfg, token_lists, [[((np.zeros((1296, 1176), np.uint8)), (1, 36, 36))]] * B)
import dataclasses

embeds = jnp.zeros((B * n_img, cfg.text.hidden_size), jnp.bfloat16)
b1 = dataclasses.replace(
    b1,
    input_ids=jax.device_put(b1.input_ids),
    position_ids=jax.device_put(b1.position_ids),
    pixel_values=embeds,
    vision_meta=None,
)


def wave(max_new):
    gcfg = GenerationConfig(max_new_tokens=max_new, temperature=0.0)
    toks, cache = g.generate(b1, gcfg, block=False)
    toks.copy_to_host_async()
    return np.asarray(toks)[0, :1]


w32 = timed("generate(32)", lambda: wave(32), reps=4)
w160 = timed("generate(160)", lambda: wave(160), reps=4)
step = (w160 - w32) / 128
resid = w160 - 1.422 - 160 * step
print(f"decode step: {step*1e3:.2f} ms; gen1(160) call residual over "
      f"(1.422 prefill-device + decode): {resid*1e3:.0f} ms", flush=True)
