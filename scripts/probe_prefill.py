"""Per-layer scan-slope probes for the PREFILL path on the real TPU.

Why: at B=48 the gen1 prefill (S=768, vision embeds cached) runs ~2.5 s for
~2.07e14 FLOPs = ~40% MXU; chunk prefill shows the same efficiency. This probe
splits one decoder layer (and one ViT block) into components to find where the
other 60% goes, using the measurement discipline from BASELINE.md r3/r4:

- time a jitted lax.scan of the LAYER with the cache as a live carry (so writes
  and converts can't be hoisted), via a small blocking readback;
- per-call overhead is calibrated from two scan lengths on the "full" mode and
  subtracted from single-length variant runs;
- per-layer slope x36 reproduces in-model deltas (validated r4 for decode).

Modes (decoder layer, B=48 S=768 T=1536, int8 fused weights unless noted):
  full          qkv + rope + vmap-DUS kv write @0 + flash attn + wo + mlp  (gen1 path)
  scatterwrite  same but per-token scatter write (chunk-prefill path)
  nowrite       no kv write (attention reads the carry cache)
  noattn        no attention, no write: matmuls+rope only
  bf16          full with bf16 weights (int8 prefill penalty)
ViT block (S=49152, hidden 1280, 64-patch windows = crop ViT at B=48):
  vit_full      qkv + rope + segment flash attn + wo + swiglu mlp
  vit_noattn    matmuls only
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.decoder import _mlp
from zoomearth_tpu.models.rope import apply_rotary, mrope_cos_sin, vision_rope_cos_sin
from zoomearth_tpu.models.vit import rms_norm
from zoomearth_tpu.ops.attention import segment_attention_auto
from zoomearth_tpu.ops.flash_causal import flash_causal_attention
from zoomearth_tpu.ops.quant import fuse_decoder_matmuls, qdot, quantize_decoder_int8
from __graft_entry__ import _zero_params

cfg = VLMConfig.qwen2_5_vl_3b()
tc = cfg.text
vc = cfg.vision
B, S, T = 48, 768, 1536
H, Hkv, D, E = tc.num_attention_heads, tc.num_key_value_heads, tc.head_dim, tc.hidden_size

print(f"device: {jax.devices()[0]}", file=sys.stderr)

params = _zero_params(cfg, jnp.bfloat16)
params = fuse_decoder_matmuls(params)
layer_bf16 = params["text"]["layers"][0]
layer_q = quantize_decoder_int8(params)["text"]["layers"][0]
vit_block = params["vision"]["blocks"][0]

pos2 = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
pos3 = jnp.broadcast_to(jnp.arange(S)[None, None], (3, B, S))
COS, SIN = mrope_cos_sin(pos3, tc.head_dim, tc.mrope_section, tc.rope_theta)
KV_LEN = jnp.full((B,), S, jnp.int32)
BIDX = jnp.arange(B)[:, None]


def layer_step(layer, x, kc, vvc, mode):
    h = rms_norm(x, layer["input_ln"]["scale"], tc.rms_norm_eps)
    qkv = qdot(h, layer["attn"]["wqkv"]) + layer["attn"]["bqkv"]
    q = qkv[..., : H * D].reshape(B, S, H, D)
    k = qkv[..., H * D : (H + Hkv) * D].reshape(B, S, Hkv, D)
    v = qkv[..., (H + Hkv) * D :].reshape(B, S, Hkv, D)
    q = apply_rotary(q, COS, SIN)
    k = apply_rotary(k, COS, SIN)
    if mode == "noattn":
        attn = q
    else:
        if mode == "scatterwrite":
            kc = kc.at[BIDX, :, pos2, :].set(k.astype(kc.dtype), mode="drop")
            vvc = vvc.at[BIDX, :, pos2, :].set(v.astype(vvc.dtype), mode="drop")
        elif mode in ("full", "bf16"):
            kT = k.transpose(0, 2, 1, 3)
            vT = v.transpose(0, 2, 1, 3)
            scat = jax.vmap(lambda c, u, i: jax.lax.dynamic_update_slice(c, u, (0, i, 0)))
            zero = jnp.zeros((B,), jnp.int32)
            kc = scat(kc, kT.astype(kc.dtype), zero)
            vvc = scat(vvc, vT.astype(vvc.dtype), zero)
        attn = flash_causal_attention(q, kc, vvc, pos2, KV_LEN)
    out = qdot(attn.reshape(B, S, H * D), layer["attn"]["wo"])
    x = x + out
    h = rms_norm(x, layer["post_ln"]["scale"], tc.rms_norm_eps)
    x = x + _mlp(layer["mlp"], h)
    return x, kc, vvc


def make_probe(mode, n):
    layer = layer_bf16 if mode == "bf16" else layer_q

    def fn(x, kc, vvc):
        def body(carry, _):
            x, kc, vvc = carry
            x, kc, vvc = layer_step(layer, x, kc, vvc, mode)
            # keep the carry bounded (zeros params -> stays zeros anyway)
            return (x * 0.5, kc, vvc), ()

        (x, kc, vvc), _ = jax.lax.scan(body, (x, kc, vvc), None, length=n)
        return jnp.sum(x[0, 0]) + jnp.sum(kc[0, 0, 0]).astype(jnp.float32)

    return jax.jit(fn)


# --- ViT block probe (chunk-prefill crop tower shape) -----------------------
SV = 49152  # 48 crops x 1024 patches (512px, 32x32 grid)
HV, DV, EV = vc.num_heads, vc.head_dim, vc.hidden_size
SEG_WIN = (jnp.arange(SV) // 64).astype(jnp.int32)  # 64-patch windows, ascending
pos_ids_v = np.zeros((SV, 2), np.int32)
VCOS, VSIN = vision_rope_cos_sin(jnp.asarray(pos_ids_v), vc.head_dim)


def vit_step(x, mode):
    h = rms_norm(x, vit_block["norm1"]["scale"], vc.rms_norm_eps)
    qkv = h @ vit_block["attn"]["wqkv"] + vit_block["attn"]["bqkv"]
    qkv = qkv.reshape(SV, 3, HV, DV)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    q = apply_rotary(q, VCOS, VSIN)
    k = apply_rotary(k, VCOS, VSIN)
    if mode == "vit_noattn":
        attn = q
    else:
        attn = segment_attention_auto(q, k, v, SEG_WIN)
    attn = attn.reshape(SV, EV) @ vit_block["attn"]["wo"] + vit_block["attn"]["bo"]
    x = x + attn
    h = rms_norm(x, vit_block["norm2"]["scale"], vc.rms_norm_eps)
    return (x + _vit_mlp_local(h)) * 0.5


def _vit_mlp_local(h):
    p = vit_block["mlp"]
    g = jax.nn.silu(h @ p["wg"] + p["bg"])
    u = h @ p["wu"] + p["bu"]
    return (g * u) @ p["wd"] + p["bd"]


def make_vit_probe(mode, n):
    def fn(x):
        def body(x, _):
            return vit_step(x, mode), ()

        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x[0])

    return jax.jit(fn)


def run(fn, args, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))  # blocking readback (block_until_ready lies on axon)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    x0 = jnp.zeros((B, S, E), jnp.bfloat16)
    kc0 = jnp.zeros((B, Hkv, T, D), jnp.bfloat16)
    vc0 = jnp.zeros((B, Hkv, T, D), jnp.bfloat16)
    N1, N2 = 16, 96

    results = {}
    # calibrate per-call overhead from full@N1 vs full@N2
    t_c = time.time()
    f1 = make_probe("full", N1)
    f2 = make_probe("full", N2)
    t1 = run(f1, (x0, kc0, vc0))
    t2 = run(f2, (x0, kc0, vc0))
    per_iter_full = (t2 - t1) / (N2 - N1)
    overhead = t1 - N1 * per_iter_full
    print(f"[full] N{N1}={t1:.3f}s N{N2}={t2:.3f}s -> {per_iter_full*1e3:.2f} ms/layer, "
          f"call overhead {overhead:.3f}s (compile+measure {time.time()-t_c:.0f}s)",
          flush=True)
    results["full"] = per_iter_full

    for mode in ("scatterwrite", "nowrite", "noattn", "bf16"):
        t_c = time.time()
        f = make_probe(mode, N2)
        t = run(f, (x0, kc0, vc0))
        per_iter = (t - overhead) / N2
        print(f"[{mode}] N{N2}={t:.3f}s -> {per_iter*1e3:.2f} ms/layer "
              f"(compile+measure {time.time()-t_c:.0f}s)", flush=True)
        results[mode] = per_iter

    xv0 = jnp.zeros((SV, EV), jnp.bfloat16)
    for mode in ("vit_full", "vit_noattn"):
        t_c = time.time()
        f = make_vit_probe(mode, N2)
        t = run(f, (xv0,))
        per_iter = (t - overhead) / N2
        print(f"[{mode}] N{N2}={t:.3f}s -> {per_iter*1e3:.2f} ms/block "
              f"(compile+measure {time.time()-t_c:.0f}s)", flush=True)
        results[mode] = per_iter

    print("\n--- breakdown (ms/layer, x36 = in-model s) ---")
    f, nw, na, sw = results["full"], results["nowrite"], results["noattn"], results["scatterwrite"]
    print(f"matmuls+rope:   {na*1e3:7.2f}  ({na*36:.2f} s/model)")
    print(f"flash attn:     {(nw-na)*1e3:7.2f}  ({(nw-na)*36:.2f} s/model)")
    print(f"DUS kv write:   {(f-nw)*1e3:7.2f}  ({(f-nw)*36:.2f} s/model)")
    print(f"scatter write:  {(sw-nw)*1e3:7.2f}  ({(sw-nw)*36:.2f} s/model)")
    print(f"int8-vs-bf16:   {(f-results['bf16'])*1e3:7.2f} ms/layer penalty")
    print(f"vit attn:       {(results['vit_full']-results['vit_noattn'])*1e3:7.2f} ms/block "
          f"({(results['vit_full']-results['vit_noattn'])*32:.2f} s/tower)")
    print(f"vit matmuls:    {results['vit_noattn']*1e3:7.2f} ms/block "
          f"({results['vit_noattn']*32:.2f} s/tower)")
    print(f"vit full x32:   {results['vit_full']*32:.2f} s/tower")
    # theoretical floors at v5e ~197 TFLOP/s bf16
    layer_params = E * (H + 2 * Hkv) * D + E * E + 3 * E * tc.intermediate_size
    flops = 2 * layer_params * B * S
    print(f"theoretical matmul floor: {flops/197e12*1e3:.2f} ms/layer")


if __name__ == "__main__":
    main()
