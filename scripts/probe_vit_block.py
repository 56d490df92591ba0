"""Scan-slope breakdown of ONE ViT block at the bench stage-2 shape (S=62208,
edge windows) — where does the ~66 ms/block actually go?

Modes:
  full       norm + qkv + rope + flash segment attn + wo + norm + swiglu mlp
  win1       same but dense prev/self/next windowed attention (current mode 1)
  win2g      gather-to-uniform windowed attention: host-precomputed window index
             gathers rows into (nw, 64, H, D), block-diagonal attention, scatter back
  noattn     attention replaced by identity
  matmulonly qkv + wo + mlp only (no norm/rope/attn) — pure MXU
Measured via two scan lengths (slope = per-block cost, intercept = call overhead).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from zoomearth_tpu.config import VLMConfig
from zoomearth_tpu.models.rope import apply_rotary, vision_rope_cos_sin
from zoomearth_tpu.models.vit import rms_norm, vision_metadata
from zoomearth_tpu.ops.attention import segment_attention_auto, window_block_attention
from __graft_entry__ import _zero_params

cfg = VLMConfig.qwen2_5_vl_3b()
vc = cfg.vision
HV, DV, EV = vc.num_heads, vc.head_dim, vc.hidden_size

grids = [(1, 36, 36)] * 48
n = sum(t * h * w for t, h, w in grids)
pad_to = -(-n // 256) * 256
meta = vision_metadata(grids, vc, pad_to=pad_to)
SV = pad_to
print(f"device: {jax.devices()[0]} S={SV} win_mode={meta.win_mode}", file=sys.stderr)

blk = _zero_params(cfg, jnp.bfloat16)["vision"]["blocks"][0]
SEG = jnp.asarray(meta.seg_window)
VCOS, VSIN = vision_rope_cos_sin(jnp.asarray(meta.pos_ids), vc.head_dim)

# gather-to-uniform index: window w's rows at [starts[w], starts[w]+counts[w])
seg_np = np.asarray(meta.seg_window)
# contiguous ascending runs (incl. the pad tail split into 64-row pseudo-windows)
runs = []
s = 0
for i in range(1, len(seg_np) + 1):
    if i == len(seg_np) or seg_np[i] != seg_np[s]:
        ln = i - s
        for off in range(0, ln, 64):
            runs.append((s + off, min(64, ln - off)))
        s = i
NW = len(runs)
gidx = np.zeros((NW, 64), np.int32)
gvalid = np.zeros((NW, 64), bool)
for w, (st, ln) in enumerate(runs):
    gidx[w, :ln] = np.arange(st, st + ln)
    gvalid[w, :ln] = True
# scatter index: original row -> (window, slot)
sidx = np.zeros((SV,), np.int32)
for w, (st, ln) in enumerate(runs):
    sidx[st : st + ln] = w * 64 + np.arange(ln)
GIDX = jnp.asarray(gidx.reshape(-1))
GVALID = jnp.asarray(gvalid)
SIDX = jnp.asarray(sidx)
print(f"windows={NW}", file=sys.stderr)


def win2g_attention(q, k, v):
    qg = jnp.take(q, GIDX, axis=0).reshape(NW, 64, HV, DV)
    kg = jnp.take(k, GIDX, axis=0).reshape(NW, 64, HV, DV)
    vg = jnp.take(v, GIDX, axis=0).reshape(NW, 64, HV, DV)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qg, kg).astype(jnp.float32) * (DV**-0.5)
    logits = jnp.where(GVALID[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), vg)
    return jnp.take(out.reshape(NW * 64, HV, DV), SIDX, axis=0)


def step(x, mode):
    if mode == "matmulonly":
        h = x @ blk["attn"]["wqkv"] + blk["attn"]["bqkv"]
        h = h[:, : EV] @ blk["attn"]["wo"] + blk["attn"]["bo"]
        x = x + h
        g = jax.nn.silu(x @ blk["mlp"]["wg"] + blk["mlp"]["bg"])
        u = x @ blk["mlp"]["wu"] + blk["mlp"]["bu"]
        return (x + (g * u) @ blk["mlp"]["wd"] + blk["mlp"]["bd"]) * 0.5
    h = rms_norm(x, blk["norm1"]["scale"], vc.rms_norm_eps)
    qkv = (h @ blk["attn"]["wqkv"] + blk["attn"]["bqkv"]).reshape(SV, 3, HV, DV)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    q = apply_rotary(q, VCOS, VSIN)
    k = apply_rotary(k, VCOS, VSIN)
    if mode == "noattn":
        attn = q
    elif mode == "win1":
        attn = window_block_attention(q, k, v, SEG, neighbors=True)
    elif mode == "win2g":
        attn = win2g_attention(q, k, v)
    else:
        attn = segment_attention_auto(q, k, v, SEG)
    attn = attn.reshape(SV, EV) @ blk["attn"]["wo"] + blk["attn"]["bo"]
    x = x + attn
    h = rms_norm(x, blk["norm2"]["scale"], vc.rms_norm_eps)
    g = jax.nn.silu(h @ blk["mlp"]["wg"] + blk["mlp"]["bg"])
    u = h @ blk["mlp"]["wu"] + blk["mlp"]["bu"]
    return (x + (g * u) @ blk["mlp"]["wd"] + blk["mlp"]["bd"]) * 0.5


def make(mode, nsteps):
    def fn(x):
        def body(x, _):
            return step(x, mode), ()

        x, _ = jax.lax.scan(body, x, None, length=nsteps)
        return jnp.sum(x[0])

    return jax.jit(fn)


def run(fn, x, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(x))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    x0 = jnp.zeros((SV, EV), jnp.bfloat16)
    N1, N2 = 4, 20
    f1, f2 = make("full", N1), make("full", N2)
    t1, t2 = run(f1, x0), run(f2, x0)
    slope = (t2 - t1) / (N2 - N1)
    over = t1 - N1 * slope
    print(f"[full] {slope*1e3:.2f} ms/block (overhead {over*1e3:.0f} ms)", flush=True)
    for mode in ("win1", "win2g", "noattn", "matmulonly"):
        t = run(make(mode, N2), x0)
        print(f"[{mode}] {(t-over)/N2*1e3:.2f} ms/block", flush=True)
    fl = 2 * (EV * 3 * EV + EV * EV + 3 * EV * vc.intermediate_size) * SV
    print(f"matmul floor @197TF/s: {fl/197e12*1e3:.2f} ms/block")


if __name__ == "__main__":
    main()


# --- fullatt block variants (uniform 1296-patch images, S = 48*1296 exactly) --------
N_IMG, L_IMG = 48, 1296
assert N_IMG * L_IMG == SV
SEG_FULL = jnp.asarray(meta.seg_full)
L_PAD = 1536  # multiple of the 512 block size for the stock pallas flash


def full_dense8(q, k, v):
    """Reshape to (48, 1296, H, D); dense sdpa in chunks of 8 images (bounds the
    fp32 logits transient to 8*16*1296^2*4 = 860 MB)."""
    qb = q.reshape(6, 8, L_IMG, HV, DV)
    kb = k.reshape(6, 8, L_IMG, HV, DV)
    vb = v.reshape(6, 8, L_IMG, HV, DV)

    def chunk(args):
        qc, kc, vc = args
        logits = jnp.einsum("bshd,bthd->bhst", qc, kc).astype(jnp.float32) * (DV**-0.5)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhst,bthd->bshd", probs.astype(vc.dtype), vc)

    out = jax.lax.map(chunk, (qb, kb, vb))
    return out.reshape(SV, HV, DV)


def full_libflash(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    pad = L_PAD - L_IMG
    qb = q.reshape(N_IMG, L_IMG, HV, DV).transpose(0, 2, 1, 3)
    kb = k.reshape(N_IMG, L_IMG, HV, DV).transpose(0, 2, 1, 3)
    vb = v.reshape(N_IMG, L_IMG, HV, DV).transpose(0, 2, 1, 3)
    qb = jnp.pad(qb, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kb = jnp.pad(kb, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vb = jnp.pad(vb, ((0, 0), (0, 0), (0, pad), (0, 0)))
    ids = jnp.concatenate([jnp.zeros((N_IMG, L_IMG), jnp.int32),
                           jnp.ones((N_IMG, pad), jnp.int32)], axis=1)
    bs = BlockSizes(block_q=512, block_k_major=512, block_k=512, block_b=1)
    out = flash_attention(qb, kb, vb, segment_ids=SegmentIds(ids, ids),
                          sm_scale=DV**-0.5, block_sizes=bs)
    return out[:, :, :L_IMG].transpose(0, 2, 1, 3).reshape(SV, HV, DV)


def step_full(x, mode):
    h = rms_norm(x, blk["norm1"]["scale"], vc.rms_norm_eps)
    qkv = (h @ blk["attn"]["wqkv"] + blk["attn"]["bqkv"]).reshape(SV, 3, HV, DV)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    q = apply_rotary(q, VCOS, VSIN)
    k = apply_rotary(k, VCOS, VSIN)
    if mode == "full_flashseg":
        attn = segment_attention_auto(q, k, v, SEG_FULL)
    elif mode == "full_dense8":
        attn = full_dense8(q, k, v)
    elif mode == "full_libflash":
        attn = full_libflash(q, k, v)
    attn = attn.reshape(SV, EV) @ blk["attn"]["wo"] + blk["attn"]["bo"]
    x = x + attn
    h = rms_norm(x, blk["norm2"]["scale"], vc.rms_norm_eps)
    g = jax.nn.silu(h @ blk["mlp"]["wg"] + blk["mlp"]["bg"])
    u = h @ blk["mlp"]["wu"] + blk["mlp"]["bu"]
    return (x + (g * u) @ blk["mlp"]["wd"] + blk["mlp"]["bd"]) * 0.5


def make_full(mode, nsteps):
    def fn(x):
        def body(x, _):
            return step_full(x, mode), ()

        x, _ = jax.lax.scan(body, x, None, length=nsteps)
        return jnp.sum(x[0])

    return jax.jit(fn)


def main_full():
    x0 = jnp.zeros((SV, EV), jnp.bfloat16)
    N2 = 8
    f1 = make_full("full_flashseg", 2)
    t1 = run(f1, x0)
    f2 = make_full("full_flashseg", N2)
    t2 = run(f2, x0)
    slope = (t2 - t1) / (N2 - 2)
    over = t1 - 2 * slope
    print(f"[full_flashseg] {slope*1e3:.2f} ms/block (overhead {over*1e3:.0f} ms)", flush=True)
    for mode in ("full_dense8", "full_libflash"):
        t = run(make_full(mode, N2), x0)
        print(f"[{mode}] {(t-over)/N2*1e3:.2f} ms/block", flush=True)


if __name__ == "__main__" and __import__("os").environ.get("PROBE_FULL") == "1":
    main_full()
